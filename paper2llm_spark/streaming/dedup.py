"""Streaming exact dedup — first-seen content over a growing corpus.

The batch operator (operators/dedup.dedup_exact) answers "which doc
represents each content group"; the streaming flavor answers it
INCREMENTALLY: as new files land, emit (content_md5, keep_doc_id) only
for content never seen before.  Exactly-once file progress lives in the
streaming checkpoint; the dedup state is the SINK ITSELF — each
micro-batch collapses to min(doc_id) per digest map-side, then
anti-joins the digests already emitted (a column-pruned scan of the
sink reads only ``content_md5``).  A replayed batch re-derives the same
survivors against the same sink, so the append is idempotent.

Production variants of the same shape: ``dropDuplicates`` on the digest
with the HDFS/RocksDB state store (state bounded by a watermark), or a
MERGE into a key-addressed table (Delta/Iceberg upsert).  The sink-as-
state form is chosen here because it keeps every byte inspectable by
the correctness gate.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def incremental_exact_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    *,
    available_now: bool = True,
):
    """Start the streaming dedup job; returns the StreamingQuery.

    ``output_dir`` holds ``dedup/`` (appended parquet of first-seen
    (content_md5, keep_doc_id) rows) and ``stream_checkpoint/``.
    """
    out_path = os.path.join(output_dir, "dedup")
    ckpt_path = os.path.join(output_dir, "stream_checkpoint")

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        fresh = batch_df.groupBy(F.md5("text").alias("content_md5")).agg(
            F.min("doc_id").alias("keep_doc_id")
        )
        if os.path.isdir(out_path):  # first batch: no sink yet
            seen = spark.read.parquet(out_path).select("content_md5")
            fresh = fresh.join(seen, "content_md5", "left_anti")
        fresh.write.mode("append").parquet(out_path)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", ckpt_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
