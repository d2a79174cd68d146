"""Curated-corpus shard writer — the output-layout half of curation.

A 100 TB training-data pipeline does not end at a DataFrame: the curated
corpus must land as a PARTITIONED, SIZE-BOUNDED file layout that the
training data-loader can shard deterministically. This writer lays the
corpus out as

    out_dir/lang=<lang>/q_bucket=<0..N-1>/part-*.parquet

* partition columns ``(lang, q_bucket)`` — the two axes training jobs
  filter on (language mix, quality threshold) become partition-pruned
  directory scans, so "train on en, top-quality half" reads only those
  directories;
* ``q_bucket = least(floor(quality * N), N-1)`` off the shared scorer in
  operators/textstats.py — a pure projection, no global sort (an ntile
  ranking would need one);
* ``maxRecordsPerFile`` bounds every output file so loader shards have
  uniform row counts — Spark splits oversized write tasks, no extra
  repartition needed.

The write itself is exercised by the ``corpus_shard_manifest`` driver
query: it writes the layout to a scratch dir, reads it BACK, and returns
per-(lang, q_bucket) document counts — DuckDB computes the same counts
straight from the documents table, so the correctness gate covers the
whole write -> partition -> read-back path. File-level invariants
(every file <= max_records, partition dirs match bucket values) are
asserted in tests/test_sink.py.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from .textstats import with_quality

N_QUALITY_BUCKETS = 4
MAX_RECORDS_PER_FILE = 100


def quality_bucket(qcol) -> F.Column:
    """quality in [0, 1] -> bucket 0..N-1 (top bucket closed at 1.0)."""
    return F.least(
        F.floor(qcol * N_QUALITY_BUCKETS).cast("int"),
        F.lit(N_QUALITY_BUCKETS - 1),
    )


def write_curated_shards(
    docs: DataFrame,
    out_dir: str,
    *,
    max_records_per_file: int = MAX_RECORDS_PER_FILE,
) -> None:
    """Score, bucket, and write ``docs`` (needs doc_id/text/lang) as the
    partitioned layout described in the module docstring."""
    staged = docs.select(
        "doc_id", "text", "lang", tokens(F.col("text")).alias("toks")
    )
    scored = with_quality(staged).select(
        "doc_id", "text", "lang", "quality",
        quality_bucket(F.col("quality")).alias("q_bucket"),
    )
    (
        scored.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("lang", "q_bucket")
        .parquet(out_dir)
    )


def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: write the layout, read it back, count per shard."""
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    out_dir = os.path.join(tempfile.gettempdir(), f"p2l_shards_{tag}")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    write_curated_shards(docs, out_dir)
    back = spark.read.parquet(out_dir)
    return (
        back.groupBy("lang", "q_bucket")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .select("lang", F.col("q_bucket").cast("bigint").alias("q_bucket"), "n_docs")
    )


# the dual recomputes quality + bucket straight off the documents table
# (formula mirrored from textstats.QUALITY_SQL via webcorpus._QUALITY_EXPR)
def _manifest_sql() -> str:
    from ..functions.text import SQL_TOKENS
    from .webcorpus import _QUALITY_EXPR, _STOPWORDS_IN

    tok = SQL_TOKENS.format(expr="text")
    return f"""
WITH t AS (
  SELECT doc_id, lang,
         length(text) AS n_chars,
         len({tok}) AS n_words,
         len(list_filter({tok}, t -> t IN ({_STOPWORDS_IN}))) AS n_stop,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct
  FROM documents
),
q AS (SELECT doc_id, lang, {_QUALITY_EXPR} AS quality FROM t),
b AS (
  SELECT lang,
         least(floor(quality * {N_QUALITY_BUCKETS})::INT,
               {N_QUALITY_BUCKETS - 1}) AS q_bucket
  FROM q
)
SELECT lang, q_bucket::BIGINT AS q_bucket, count(*)::BIGINT AS n_docs
FROM b GROUP BY lang, q_bucket
"""


QUERIES: dict[str, tuple] = {
    "corpus_shard_manifest": (shard_manifest, _manifest_sql()),
}
