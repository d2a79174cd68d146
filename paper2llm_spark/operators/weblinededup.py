"""Within-document repeated-line dedup — RefinedWeb's "line-wise
corrections" stage (Penedo et al. 2023 §3.2 remove duplicated lines
inside a page: nav bars, "subscribe" prompts and cookie banners
repeat VERBATIM inside a document after template rendering), distinct
from cross-document line dedup (C4) which this repo already covers
(operators/webcorpus.py paragraph dedup).

Semantics (frozen): split the body on ``\\n``; keep each line's FIRST
occurrence, preserving order; drop later verbatim repeats (empty
lines dedup like any other — a second blank line is template noise
too).  Emit per doc the line count before/after and the md5 of the
deduped body (lines re-joined with ``\\n``) so the dual checks the
rebuilt text byte-for-byte.

Cross-engine mapping: Spark ``filter(lines, (x, i) ->
NOT array_contains(slice(lines, 1, i), x))`` (0-based lambda index —
the prefix BEFORE x has length i) is exactly DuckDB ``list_filter(
lines, (x, i) -> NOT list_contains(lines[1:i-1], x))`` (1-based
index — the prefix is ``[1, i-1]``).  Both are higher-order functions
evaluated per row with no regex and no UDF.

The driver corpus is single-line prose, so the registered query
plants template damage in-engine: an even hash roll appends a 4-line
tail whose "subscribe" line repeats 3x (keep-first drops 2), the odd
roll leaves the doc alone (1 line in, 1 line out) — both branches and
the order-preservation are exercised, identically in the dual.

Plan shape (the scale story): the dedup is per-document local work —
the CORRECT distribution for this operator is NO distribution: zero
joins, zero exchanges, zero Python (plan-asserted), the HOF runs
inside the scan task.  The prefix-scan comparison is O(L^2) in lines
per doc; at web scale L is bounded (RefinedWeb operates per page,
~10^2 lines) and the constant is a codegen string compare — for
pathological L, hash each line first (same shape, bigint compares)
or mapInPandas with a per-doc hash set; the HOF formulation is the
shuffle-free shape either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

_TAIL = (
    "\nSubscribe to our newsletter"
    "\nFollow us on social media"
    "\nSubscribe to our newsletter"
    "\nSubscribe to our newsletter"
)


def line_dedup_frame(docs: DataFrame) -> DataFrame:
    """doc_id, text -> line counts + md5 of the keep-first-deduped body."""
    lines = F.split(F.col("text"), "\n", -1)
    kept = F.filter(
        lines,
        lambda x, i: ~F.array_contains(F.slice(lines, F.lit(1), i), x),
    )
    return docs.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.md5(F.concat_ws("\n", kept)).alias("dedup_md5"),
    )


def synth_template_docs(docs: DataFrame) -> DataFrame:
    roll = portable_hash60(
        F.concat(F.col("doc_id").cast("string"), F.lit(":lines"))
    ) % 2
    planted = (
        F.when(roll == 0, F.concat(F.col("text"), F.lit(_TAIL)))
        .otherwise(F.col("text"))
    )
    return docs.select("doc_id", planted.alias("text"))


def line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return line_dedup_frame(synth_template_docs(docs))


_ROLL = sql_hash60("doc_id || ':lines'")
_TAIL_SQL = _TAIL.replace("\n", "' || chr(10) || '")

LINE_DEDUP_SQL = f"""
WITH planted AS (
  SELECT doc_id,
    CASE WHEN {_ROLL} % 2 = 0 THEN text || '{_TAIL_SQL}'
         ELSE text END AS body
  FROM documents
),
s AS (
  SELECT doc_id, string_split(body, chr(10)) AS lines FROM planted
),
k AS (
  SELECT doc_id, lines,
         list_filter(
           lines, (x, i) -> NOT list_contains(lines[1:i-1], x)
         ) AS kept
  FROM s
)
SELECT doc_id,
       length(lines)::BIGINT AS n_lines,
       length(kept)::BIGINT AS n_kept,
       md5(array_to_string(kept, chr(10))) AS dedup_md5
FROM k
"""


QUERIES: dict[str, tuple] = {
    "text_line_dedup": (line_dedup, LINE_DEDUP_SQL),
}
