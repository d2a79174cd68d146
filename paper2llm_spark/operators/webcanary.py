"""Privacy canary audit — planted-secret leak detection through the
duplicated-span detector (Carlini et al. USENIX Security 2019 "The
Secret Sharer" established canary insertion as THE memorization/
leak probe; in a data pipeline the same canaries certify that the
span-level dedup/decontamination machinery actually catches a
secret that leaked into a second document).

Composes the registered `dedup_substring_spans` pipeline verbatim
over a canary-planted corpus (the webrouge splice discipline: the
Spark side calls `substring_spans_frame`, the dual splices the
registered SQL's pipeline tail onto the planted-corpus CTE,
assert-guarded).

Semantics (frozen): every ``doc_id % 67 == 0`` doc is a CARRIER —
its text gains a 5-token canary of fully id-salted tokens
(``cn{id}a .. cn{id}e`` — no cross-canary token overlap, so
canaries can never collide with each other or natural text);
every ``doc_id % 134 == 0`` carrier additionally LEAKS: a twin doc
(``doc_id + LEAK_BASE``) holds one unique filler token plus the
same canary.  Audit per carrier:

* ``leaked``        — the ground truth (planted)
* ``leak_detected`` — the leak twin surfaced >= 1 duplicated span
* ``carrier_flagged`` — the carrier doc has a span reaching into
  its canary zone (``span_end > n_base_tokens``)
* ``leak_span_toks`` — longest span on the twin (0 if none)

The detector must score recall 1.0 on leaked canaries and flag NO
unleaked canary (pytest-locked both ways) — unique tokens make a
single-occurrence canary invisible to any k-gram with k >= 1 of
its tokens, by construction.

Plan shape (the scale story): the span pipeline's own two
exchanges do the work over the planted scan (plant is a narrow
union, no extra corpus movement); the audit joins the per-doc span
rollup back on doc_id short rows.  Zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, tokens
from .websubstr import SUBSTRING_SPANS_SQL, substring_spans_frame

CARRIER_MOD = 67
LEAK_MOD = 134
LEAK_BASE = 80_000_000

_CANARY = (
    "concat(' cn', cast(doc_id as string), 'a cn',"
    " cast(doc_id as string), 'b cn', cast(doc_id as string), 'c cn',"
    " cast(doc_id as string), 'd cn', cast(doc_id as string), 'e')"
)


def _planted(docs: DataFrame) -> DataFrame:
    base = docs.select(
        "doc_id",
        F.expr(
            f"case when doc_id % {CARRIER_MOD} = 0"
            f" then concat(text, {_CANARY}) else text end"
        ).alias("text"),
    )
    leaks = docs.filter(F.col("doc_id") % LEAK_MOD == 0).select(
        (F.col("doc_id") + LEAK_BASE).alias("doc_id"),
        F.expr(
            f"concat('lf', cast(doc_id as string), {_CANARY})"
        ).alias("text"),
    )
    return base.unionByName(leaks)


def canary_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    ).select("doc_id", "text")
    spans = substring_spans_frame(_planted(docs))
    carriers = docs.filter(F.col("doc_id") % CARRIER_MOD == 0).select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_base"),
        (F.col("doc_id") % LEAK_MOD == 0).alias("leaked"),
    )
    twin_spans = spans.filter(F.col("doc_id") >= LEAK_BASE).groupBy(
        "doc_id"
    ).agg(F.max("span_toks").cast("bigint").alias("leak_span_toks"))
    carrier_spans = spans.filter(F.col("doc_id") < LEAK_BASE).groupBy(
        "doc_id"
    ).agg(F.max("span_end").cast("bigint").alias("max_span_end"))
    return (
        carriers.join(
            twin_spans.select(
                (F.col("doc_id") - LEAK_BASE).alias("doc_id"),
                "leak_span_toks",
            ),
            "doc_id",
            "left",
        )
        .join(carrier_spans, "doc_id", "left")
        .select(
            "doc_id",
            "leaked",
            F.col("leak_span_toks").isNotNull().alias("leak_detected"),
            F.coalesce("leak_span_toks", F.lit(0)).cast("bigint")
            .alias("leak_span_toks"),
            (F.coalesce("max_span_end", F.lit(0)) > F.col("n_base"))
            .alias("carrier_flagged"),
        )
    )


_TOK = SQL_TOKENS.format(expr="text")

_CANARY_SQL = (
    "' cn' || doc_id::VARCHAR || 'a cn' || doc_id::VARCHAR || 'b cn'"
    " || doc_id::VARCHAR || 'c cn' || doc_id::VARCHAR || 'd cn'"
    " || doc_id::VARCHAR || 'e'"
)

_PLANT_SQL = f"""
  SELECT doc_id,
         CASE WHEN doc_id % {CARRIER_MOD} = 0
              THEN text || {_CANARY_SQL} ELSE text END AS text
  FROM documents
  UNION ALL
  SELECT doc_id + {LEAK_BASE},
         'lf' || doc_id::VARCHAR || {_CANARY_SQL}
  FROM documents WHERE doc_id % {LEAK_MOD} = 0
"""

_SPLIT = "\n),\np AS ("
assert _SPLIT in SUBSTRING_SPANS_SQL, "SUBSTRING_SPANS_SQL shape changed"
_TAIL = SUBSTRING_SPANS_SQL.split(_SPLIT, 1)[1]
_SPANS_ON_PLANT = (
    f"WITH corpus AS ({_PLANT_SQL}),\n"
    f"t AS (\n  SELECT doc_id,\n"
    f"         list_filter(string_split_regex(lower(text), '\\s+'),\n"
    f"                     x -> length(x) > 0) AS toks\n"
    f"  FROM corpus{_SPLIT}{_TAIL}"
)

CANARY_AUDIT_SQL = f"""
WITH spans AS ({_SPANS_ON_PLANT}),
carriers AS (
  SELECT doc_id, len({_TOK})::BIGINT AS n_base,
         doc_id % {LEAK_MOD} = 0 AS leaked
  FROM documents WHERE doc_id % {CARRIER_MOD} = 0
),
twin AS (
  SELECT doc_id - {LEAK_BASE} AS doc_id,
         max(span_toks)::BIGINT AS leak_span_toks
  FROM spans WHERE doc_id >= {LEAK_BASE} GROUP BY 1
),
carrier_spans AS (
  SELECT doc_id, max(span_end)::BIGINT AS max_span_end
  FROM spans WHERE doc_id < {LEAK_BASE} GROUP BY 1
)
SELECT c.doc_id, c.leaked,
       t.leak_span_toks IS NOT NULL AS leak_detected,
       coalesce(t.leak_span_toks, 0)::BIGINT AS leak_span_toks,
       coalesce(s.max_span_end, 0) > c.n_base AS carrier_flagged
FROM carriers c
LEFT JOIN twin t USING (doc_id)
LEFT JOIN carrier_spans s USING (doc_id)
"""


QUERIES: dict[str, tuple] = {
    "privacy_canary_audit": (canary_audit, CANARY_AUDIT_SQL),
}
