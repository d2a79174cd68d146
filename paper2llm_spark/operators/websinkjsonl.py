"""Gzipped-JSONL shard sink + round-trip — the corpus interchange
format.  Dolma, C4, RedPajama, FineWeb and nearly every released
pretraining corpus ship as ``*.json.gz`` shards with one
``{"id", "text", "source", ...}`` object per line; an engine that
cannot emit and re-ingest them byte-faithfully cannot exchange data
with the ecosystem.  Complements the WARC/WET/WAT trio (archival
formats) with the training-side format.

Semantics (frozen): each doc serializes as the JSON object of
``(id, text, source, lang)`` in that field order (``to_json`` of a
struct is field-order-deterministic; JSON string escaping keeps every
record single-line by construction).  Shards are hash-partitioned on
``id`` into ``N_JSONL_SHARDS`` files and sorted within each shard, so
a rewritten shard is byte-stable under task retry (the write_wet
discipline).  The driver query writes the corpus, reads it back
through ``spark.read.json`` WITH AN EXPLICIT SCHEMA, and emits
per-doc facts ``(doc_id, lang, source, text_md5, text_len)``; the
DuckDB dual recomputes the same facts straight off ``documents``, so
the gate covers serialize -> gzip -> shard -> parse bit-for-bit.

Plan shape (the scale story): the write is one hash exchange on id +
in-task sort — embarrassingly parallel, one gzip stream per shard
task, no driver involvement; the read-back passes an explicit schema
because schema INFERENCE is a full extra scan of every shard at
10^12 docs (the documented spark.read.json pitfall).  Zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_JSONL_SHARDS = 8
_BACK_SCHEMA = "id long, text string, source string, lang string"


def write_jsonl(docs: DataFrame, out_dir: str,
                shards: int = N_JSONL_SHARDS) -> None:
    """(doc_id, text, source, lang) -> gzipped JSONL shard files."""
    lines = (
        docs.select(
            F.col("doc_id").cast("long").alias("id"),
            "text", "source", "lang",
        )
        .repartition(shards, F.col("id"))
        .sortWithinPartitions("id")
        .select(
            F.to_json(F.struct("id", "text", "source", "lang"))
            .alias("value")
        )
    )
    (
        lines.write.mode("overwrite")
        .option("compression", "gzip")
        .text(out_dir)
    )


def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    out_dir = os.path.join(tempfile.gettempdir(), f"p2l_jsonl_{tag}")
    shutil.rmtree(out_dir, ignore_errors=True)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source", "lang"
    )
    write_jsonl(docs, out_dir)
    back = spark.read.schema(_BACK_SCHEMA).json(out_dir)
    return back.select(
        F.col("id").alias("doc_id"),
        "lang", "source",
        F.md5("text").alias("text_md5"),
        F.length("text").cast("bigint").alias("text_len"),
    )


JSONL_ROUNDTRIP_SQL = """
SELECT doc_id, lang, source,
       md5(text) AS text_md5,
       strlen(text)::BIGINT AS text_len
FROM documents
"""


QUERIES: dict[str, tuple] = {
    "sink_jsonl_roundtrip": (jsonl_roundtrip, JSONL_ROUNDTRIP_SQL),
}
