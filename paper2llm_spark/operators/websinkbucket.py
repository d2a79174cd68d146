"""Bucketed-table co-located join — the storage-layout answer to the
biggest shuffle in any recurring pipeline.  A nightly curation run
joins the corpus against per-doc signal tables on doc_id EVERY night;
hash-bucketing both tables on the join key at write time
(``bucketBy(N, key).sortBy(key)``) makes every later join a
ZERO-EXCHANGE sort-merge: each task reads bucket i of both sides,
already co-partitioned and pre-sorted.  This is Hive bucketing /
Spark's bucketed saveAsTable, the same contract Iceberg expresses as
``bucket(N, key)`` partition transforms — at 10^12 rows it deletes
the single largest shuffle a signal-join pipeline has.

Semantics (frozen): two derived tables written bucketed-by-doc_id (8
buckets, sorted): per-doc char length + lang, and per-doc token count
+ source; the registered query joins them through the catalog and
emits ``(doc_id, lang, source, n_chars, n_toks)``.  The DuckDB dual
computes the same facts in one pass off ``documents`` — the gate
certifies the write -> catalog -> bucketed-join path end to end.
The physical-plan test asserts the join runs with NO
``Exchange hashpartitioning`` on either side — the entire point.

Plan shape (the scale story): each write is one hash exchange into N
bucket files (paid ONCE, amortized over every future join); the join
itself is scan -> sort-merge with bucket-aligned scans and zero
shuffle.  Tables land under a temp-dir external path with
deterministic names and ``mode("overwrite")`` so driver re-runs are
idempotent.  Zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, tokens

N_BUCKETS = 8


def _write_bucketed(df: DataFrame, name: str, path: str) -> None:
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(N_BUCKETS, "doc_id")
        .sortBy("doc_id")
        .saveAsTable(name)
    )


def bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    import os
    import tempfile

    tag = (os.path.basename(sf_dir.rstrip("/")) or "sf").replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), f"p2l_bkt_{tag}")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t1, t2 = f"p2l_bkt_chars_{tag}", f"p2l_bkt_toks_{tag}"
    _write_bucketed(
        docs.select(
            "doc_id", "lang",
            F.length("text").cast("bigint").alias("n_chars"),
        ),
        t1, os.path.join(base, "chars"),
    )
    _write_bucketed(
        docs.select(
            "doc_id", "source",
            F.size(tokens(F.col("text"))).cast("bigint").alias("n_toks"),
        ),
        t2, os.path.join(base, "toks"),
    )
    return t1, t2


def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t1, t2 = bucketed_tables(spark, sf_dir)
    # hint("merge"): at corpus scale BOTH sides are 10^12-row signal
    # tables — sort-merge over aligned buckets is the strategy the
    # layout exists for.  At fixture scale the planner would broadcast
    # (and mark the scans "Bucketed: false"), which is the right call
    # for a genuinely small side but would hide the zero-exchange path
    # this operator certifies.
    return (
        spark.table(t1).hint("merge")
        .join(spark.table(t2), "doc_id")
        .select("doc_id", "lang", "source", "n_chars", "n_toks")
    )


_TOKLIST = SQL_TOKENS.format(expr="text")

BUCKETED_JOIN_SQL = f"""
SELECT doc_id, lang, source,
       strlen(text)::BIGINT AS n_chars,
       len({_TOKLIST})::BIGINT AS n_toks
FROM documents
"""


QUERIES: dict[str, tuple] = {
    "sink_bucketed_join": (bucketed_join, BUCKETED_JOIN_SQL),
}
