"""Cross-snapshot shingle novelty — the content-churn audit run when
deciding how much of a NEW crawl snapshot is worth processing
(Common Crawl publishes per-crawl "new content" rates; Cho &
Garcia-Molina's change-frequency work and the dated-dedup pass in
CCNet both need exactly this statistic: how many of this snapshot's
shingles were already seen in an earlier one).

Semantics (frozen): every document belongs to one of 3 synthetic
snapshots (a deterministic hash roll over ``doc_id`` — the driver
corpus has no ``warc_ts``).  Per document, take the DISTINCT word
3-gram shingles (hashed to 60-bit bigints so shuffle rows stay
8-byte); an *instance* is a (doc, shingle) pair.  A shingle's home
snapshot is the minimum snapshot that contains it; an instance is
*novel* iff its own snapshot IS the shingle's home snapshot (ties:
every instance in the earliest snapshot counts novel — first
appearance, not first document).  Output one row per snapshot:
instances, novel instances, and an exact-integer novelty per-mille.

The planted duplicates in the synthetic corpus (used by the dedup
family) repeat across snapshots, so novelty < 1000 for later
snapshots by construction.

Plan shape (the scale story): explode + hash ride the scan; the
DISTINCT is the first exchange (8-byte shingle key + two small
ints), the min-over-shingle window reuses hashpartitioning(sh), and
the final groupBy(snap) collapses to 3 rows via map-side partial
aggregation.  No joins, no driver state; at 10^12 documents the
heavy exchange carries ~n_tokens rows of 3 integers each — the same
shape as the MinHash signature shuffle that already scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import (
    SQL_TOKENS, SQL_TRIGRAMS, portable_hash60, sql_hash60, tokens,
    word_trigrams,
)

N_SNAPSHOTS = 3


def shingle_novelty_frame(docs: DataFrame) -> DataFrame:
    """doc_id, text, snap -> per-snapshot novelty accounting."""
    inst = (
        docs.select(
            "doc_id", "snap",
            F.explode(word_trigrams(tokens(F.col("text")))).alias("shingle"),
        )
        .select(
            "doc_id", "snap",
            portable_hash60(F.col("shingle")).alias("sh"),
        )
        .distinct()
    )
    w = Window.partitionBy("sh")
    flagged = inst.withColumn("min_snap", F.min("snap").over(w))
    return (
        flagged.groupBy("snap")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_instances"),
            F.sum(
                F.when(F.col("min_snap") == F.col("snap"), 1).otherwise(0)
            ).cast("long").alias("n_novel"),
        )
        .select(
            "snap", "n_instances", "n_novel",
            F.expr("1000 * n_novel div n_instances")
            .cast("long").alias("novelty_permille"),
        )
    )


def shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    snapped = docs.select(
        "doc_id", "text",
        (portable_hash60(
            F.concat(F.col("doc_id").cast("string"), F.lit(":snap"))
        ) % N_SNAPSHOTS).cast("long").alias("snap"),
    )
    return shingle_novelty_frame(snapped)


_TOKS = SQL_TOKENS.format(expr="text")
_TRIGRAMS = SQL_TRIGRAMS.format(tok="toks")
_SNAP_HASH = sql_hash60("doc_id || ':snap'")
_SNAP = f"({_SNAP_HASH} % {N_SNAPSHOTS})"

SHINGLE_NOVELTY_SQL = f"""
WITH snapped AS (
  SELECT doc_id, {_SNAP}::BIGINT AS snap, {_TOKS} AS toks
  FROM documents
),
inst AS (
  SELECT DISTINCT doc_id, snap, {sql_hash60("shingle")} AS sh
  FROM (
    SELECT doc_id, snap, unnest({_TRIGRAMS}) AS shingle FROM snapped
  )
),
flagged AS (
  SELECT snap, min(snap) OVER (PARTITION BY sh) AS min_snap FROM inst
)
SELECT snap,
       count(*)::BIGINT AS n_instances,
       sum(CASE WHEN min_snap = snap THEN 1 ELSE 0 END)::BIGINT AS n_novel,
       (1000 * sum(CASE WHEN min_snap = snap THEN 1 ELSE 0 END)
        // count(*))::BIGINT AS novelty_permille
FROM flagged
GROUP BY snap
"""


QUERIES: dict[str, tuple] = {
    "corpus_shingle_novelty": (shingle_novelty, SHINGLE_NOVELTY_SQL),
}
