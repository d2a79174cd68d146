"""Posting-list compressed-size accounting — the index-budget
estimator of a search stack (Zobel & Moffat, ACM Comp. Surveys 2006
§6; Elias 1975 universal codes; Golomb 1966 / Rice coding as deployed
in early Lucene and the original Google index per Dean's WSDM'09
account).  Before building a 100 TB index you size it: per term,
the exact bit cost of the delta-gapped posting list under each
candidate code — Elias-γ, Elias-δ, LEB128 varint bytes, and
Golomb-Rice with the classic per-term parameter — so the
bits-per-posting table that picks the format is a query, not a
spreadsheet.

Composes over ``search_index_postings`` (webindex.py): this operator
consumes the MATERIALIZED index — the serialized gap strings — the
way a real size audit reads the index files, so the whole postings
dataflow (stop-term cap included) is re-certified transitively by
this query's driver row.

Semantics (frozen): code values must be >= 1, so the first gap
(which is the raw first doc_id, possibly 0) enters the codespace as
``v+1`` — the standard 1-based-id convention.  With ``b(v) =
bitlen(v) = length(bin(v))``:

* ``bits_gamma  = sum(2*b(v) - 1)``
* ``bits_delta  = sum(b(v) - 1 + 2*b(b(v)) - 1)``
* ``bits_varint = sum(8 * ((b(v) + 6) div 7))``  (LEB128 whole bytes)
* ``bits_rice   = sum(((v-1) >> r) + 1 + r)`` with the per-term
  parameter ``r = max(0, b(n_docs div df) - 1)`` — the power-of-two
  stand-in for the Golomb optimum M ~ 0.69 * N/df (Witten, Moffat &
  Bell, "Managing Gigabytes" §3.3)
* ``bits_tf_gamma`` — the tf side-file under γ (tf >= 1 already)

All sums exact bigints; ``bin()`` is minimal-width in BOTH engines
(Spark `bin`, DuckDB `bin`) so ``b(v)`` is engine-identical with no
float log2 anywhere — the websketch.py discipline.

Plan shape (the scale story): ZERO new exchanges — every bit sum is
an array HOF folded in the projection directly over the postings
frame's (term, gaps, tfs) rows, with the parsed arrays STAGED as
bound attributes before the fold (HOF lambdas have no CSE — the
webindex.py 14x lesson); n_docs re-enters as a 1-row broadcast.  At
any corpus scale this prices the index for the cost of one scan over
it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .webindex import INDEX_SQL, index_postings_frame


def _bits_exprs() -> dict[str, str]:
    # b(v) = length(bin(v)); all folds over the staged arrays
    def fold(arr: str, body: str) -> str:
        return (
            f"aggregate({arr}, cast(0 as bigint), (acc, v) -> acc + ({body}))"
        )

    b = "length(bin(v))"
    return {
        "bits_gamma": fold("vs", f"2 * {b} - 1"),
        "bits_delta": fold("vs", f"{b} - 1 + 2 * length(bin({b})) - 1"),
        "bits_varint": fold("vs", f"8 * (({b} + 6) div 7)"),
        "bits_rice": fold("vs", "shiftright(v - 1, cast(r as int)) + 1 + r"),
        "bits_tf_gamma": fold("ts", f"2 * {b} - 1"),
    }


def index_bits_frame(docs: DataFrame) -> DataFrame:
    n = docs.agg(F.count("*").cast("bigint").alias("n_docs"))
    post = index_postings_frame(docs).crossJoin(F.broadcast(n))
    staged = post.select(
        "term",
        "df",
        # first gap is the raw doc_id (>= 0): shift into the 1-based
        # codespace; later gaps are already >= 1
        F.expr(
            "transform(split(gaps, ','), (x, i) ->"
            " cast(x as bigint) + if(i = 0, 1, 0))"
        ).alias("vs"),
        F.expr("transform(split(tfs, ','), x -> cast(x as bigint))")
        .alias("ts"),
        F.expr(
            "greatest(cast(0 as bigint),"
            " length(bin(n_docs div df)) - 1)"
        ).alias("r"),
    )
    ex = _bits_exprs()
    return staged.select(
        "term",
        "df",
        *[F.expr(e).cast("bigint").alias(k) for k, e in ex.items()],
    )


def index_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return index_bits_frame(docs)


def _dual_fold(arr: str, body: str) -> str:
    return (
        f"list_sum(list_transform({arr}, v -> ({body})::BIGINT))"
    )


_B = "length(bin(v))"

INDEX_BITS_SQL = f"""
WITH post AS (SELECT * FROM ({INDEX_SQL})),
n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
staged AS (
  SELECT term, df,
         list_transform(string_split(gaps, ','),
           (x, i) -> x::BIGINT + CASE WHEN i = 1 THEN 1 ELSE 0 END) AS vs,
         list_transform(string_split(tfs, ','), x -> x::BIGINT) AS ts,
         greatest(0, length(bin(n_docs // df)) - 1)::BIGINT AS r
  FROM post, n
)
SELECT term, df,
       coalesce({_dual_fold("vs", f"2 * {_B} - 1")}, 0)::BIGINT AS bits_gamma,
       coalesce({_dual_fold("vs", f"{_B} - 1 + 2 * length(bin({_B})) - 1")}, 0)::BIGINT AS bits_delta,
       coalesce({_dual_fold("vs", f"8 * (({_B} + 6) // 7)")}, 0)::BIGINT AS bits_varint,
       coalesce({_dual_fold("vs", "((v - 1) >> r) + 1 + r")}, 0)::BIGINT AS bits_rice,
       coalesce({_dual_fold("ts", f"2 * {_B} - 1")}, 0)::BIGINT AS bits_tf_gamma
FROM staged
"""


QUERIES: dict[str, tuple] = {
    "search_index_bits": (index_bits, INDEX_BITS_SQL),
}
