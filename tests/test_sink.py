"""Curated-corpus shard writer: partition layout, file-size bounds,
lossless round-trip. Cross-engine count equality for the manifest is
covered by the driver gate (corpus_shard_manifest)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from paper2llm_spark.operators.sink import (
    MAX_RECORDS_PER_FILE,
    N_QUALITY_BUCKETS,
    write_curated_shards,
)

SF_DIR = "/root/testdata/sf0.01"


def test_shard_layout_bounds_and_roundtrip(spark, tmp_path):
    out = str(tmp_path / "shards")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_in = docs.count()
    write_curated_shards(docs, out)

    files = glob.glob(os.path.join(out, "lang=*", "q_bucket=*", "*.parquet"))
    assert files, "no shard files written"
    # every file respects the row bound (loader shards stay uniform)
    for f in files:
        assert pq.ParquetFile(f).metadata.num_rows <= MAX_RECORDS_PER_FILE, f
    # partition directory values are legal buckets
    buckets = {
        int(p.split("q_bucket=")[1].split(os.sep)[0])
        for p in files
    }
    assert buckets <= set(range(N_QUALITY_BUCKETS)) and buckets

    back = spark.read.parquet(out)
    assert back.count() == n_in  # lossless
    # partition pruning works: a (lang, bucket) filter reads only its dir
    one = back.filter((F.col("lang") == "en") & (F.col("q_bucket") == buckets.pop()))
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "lang" in pf and "q_bucket" in pf, pf
