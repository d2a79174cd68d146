"""Context-length packing-efficiency audit — the table a training
team reads before fixing the sequence length (Krell et al. 2022
"Efficient Sequence Packing without Cross-contamination" measures
exactly these paddings; the T5/LLaMA data notes all report
pad-vs-trunc rates per context size).  For each candidate context
length: how many tokens of padding does per-document packing burn,
and how many tokens does truncate-to-one-sequence throw away?  The
two loss modes bracket every real packing policy (the greedy
concat packer `corpus_sequence_pack` implements sits between them).

Semantics (frozen): per context ``c`` in ``CTX_SIZES`` over per-doc
whitespace token counts ``n`` (the corpus-wide `tokens()` rule):

* ``n_chunks    = sum(ceil(n / c))``  (empty docs contribute 0)
* ``pad_tokens  = n_chunks * c - total_tokens`` — waste if every doc
  is padded out to chunk boundaries
* ``pad_rate_micro  = pad_tokens * 1e6 div (n_chunks * c)`` (0 when
  the corpus is empty)
* ``trunc_tokens = sum(max(n - c, 0))`` — loss if each doc instead
  keeps only its first chunk
* ``trunc_rate_micro = trunc_tokens * 1e6 div total_tokens``

All exact bigints; ``ceil(n / c) = (n + c - 1) div c`` on both
engines (nonnegative operands — truncation == floor).

Plan shape (the scale story): the corpus collapses BEFORE any
exchange — one scan projection computes the token count, the
4-context chunk/trunc terms fold into the SAME map-side partial
aggregate (8 sums + 2 counts in one global agg), and the |CTX_SIZES|
output rows are exploded from the single aggregated row.  ONE
single-partition exchange of one short row; zero joins, zero
Python, text pruned after the count.  At 10^12 docs this is a scan
plus ~nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, tokens

# spans the fixture's ~56-token docs (32/128 make the truncation side
# non-vacuous) up through real training contexts (padding dominates)
CTX_SIZES = (32, 128, 512, 2048)
MICRO = 1_000_000


def pack_efficiency_frame(docs: DataFrame) -> DataFrame:
    counted = docs.select(
        F.size(tokens(F.col("text"))).cast("bigint").alias("n")
    )
    aggs = [F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("total_tokens")]
    for c in CTX_SIZES:
        aggs.append(
            F.sum(F.expr(f"(n + {c - 1}) div {c}"))
            .cast("bigint")
            .alias(f"chunks_{c}")
        )
        aggs.append(
            F.sum(F.greatest(F.col("n") - c, F.lit(0)))
            .cast("bigint")
            .alias(f"trunc_{c}")
        )
    one = counted.agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).cast("bigint").alias("ctx"),
                    F.col(f"chunks_{c}").alias("n_chunks"),
                    F.col(f"trunc_{c}").alias("trunc_tokens"),
                )
                for c in CTX_SIZES
            ]
        )
    )
    return one.select("n_docs", "total_tokens", rows.alias("r")).select(
        F.col("r.ctx").alias("ctx"),
        "n_docs",
        "total_tokens",
        F.col("r.n_chunks").alias("n_chunks"),
        F.expr("r.n_chunks * r.ctx - total_tokens")
        .cast("bigint")
        .alias("pad_tokens"),
        F.expr(
            f"case when r.n_chunks = 0 then cast(0 as bigint)"
            f" else (r.n_chunks * r.ctx - total_tokens) * {MICRO}"
            f" div (r.n_chunks * r.ctx) end"
        ).cast("bigint").alias("pad_rate_micro"),
        F.col("r.trunc_tokens").alias("trunc_tokens"),
        F.expr(
            f"case when total_tokens = 0 then cast(0 as bigint)"
            f" else r.trunc_tokens * {MICRO} div total_tokens end"
        ).cast("bigint").alias("trunc_rate_micro"),
    )


def pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return pack_efficiency_frame(docs)


_TOK = SQL_TOKENS.format(expr="text")

_CTX_COLS = ",\n".join(
    f"         sum((n + {c - 1}) // {c})::BIGINT AS chunks_{c},\n"
    f"         sum(greatest(n - {c}, 0))::BIGINT AS trunc_{c}"
    for c in CTX_SIZES
)

_CTX_ROWS = ",\n".join(
    f"    {{'ctx': {c}::BIGINT, 'ch': chunks_{c}, 'tr': trunc_{c}}}"
    for c in CTX_SIZES
)

PACK_EFFICIENCY_SQL = f"""
WITH counted AS (
  SELECT len({_TOK})::BIGINT AS n FROM documents
),
one AS (
  SELECT count(*)::BIGINT AS n_docs,
         coalesce(sum(n), 0)::BIGINT AS total_tokens,
{_CTX_COLS}
  FROM counted
),
stacked AS (
  SELECT n_docs, total_tokens,
         unnest([{_CTX_ROWS}]) AS r
  FROM one
)
SELECT r['ctx']::BIGINT AS ctx,
       n_docs, total_tokens,
       r['ch']::BIGINT AS n_chunks,
       (r['ch'] * r['ctx'] - total_tokens)::BIGINT AS pad_tokens,
       (CASE WHEN r['ch'] = 0 THEN 0
             ELSE (r['ch'] * r['ctx'] - total_tokens) * {MICRO}
                  // (r['ch'] * r['ctx']) END)::BIGINT AS pad_rate_micro,
       r['tr']::BIGINT AS trunc_tokens,
       (CASE WHEN total_tokens = 0 THEN 0
             ELSE r['tr'] * {MICRO} // total_tokens END)::BIGINT
         AS trunc_rate_micro
FROM stacked
"""


QUERIES: dict[str, tuple] = {
    "corpus_pack_efficiency": (pack_efficiency, PACK_EFFICIENCY_SQL),
}
