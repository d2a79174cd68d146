"""Checkpoint/resume (C4) and lineage (C2) — north_rule requirements."""

from __future__ import annotations

from paper2llm_spark.pdf.fixtures import golden_outputs
from paper2llm_spark.plans.extract import CheckpointedExtractJob


def test_kill_and_resume_no_reprocessing(spark, fixture_pages_path, tmp_path):
    out_dir = str(tmp_path / "job_out")
    job = CheckpointedExtractJob(
        spark, fixture_pages_path, out_dir, n_buckets=8, n_groups=4
    )

    # "killed" run: completes only 2 of 4 commit groups
    r1 = job.run(max_groups=2)
    assert r1["groups_processed"] == 2
    done_after_kill = job.completed_buckets()
    assert 0 < len(done_after_kill) < 8

    partial = spark.read.parquet(job.out_path)
    n_partial = partial.count()
    assert n_partial > 0

    # resume: a fresh job object (new run id) picks up only the remainder
    job2 = CheckpointedExtractJob(
        spark, fixture_pages_path, out_dir, n_buckets=8, n_groups=4
    )
    r2 = job2.run()
    assert r2["groups_processed"] == 2  # only the remaining groups
    assert job2.completed_buckets() == set(range(8))

    final = spark.read.parquet(job.out_path)
    urls = [r["url"] for r in final.select("url").collect()]
    assert len(urls) == len(set(urls)), "resume must not duplicate any url"

    # third run: nothing left to do
    r3 = CheckpointedExtractJob(
        spark, fixture_pages_path, out_dir, n_buckets=8, n_groups=4
    ).run()
    assert r3["groups_processed"] == 0
    assert spark.read.parquet(job.out_path).count() == len(urls)

    # final output matches goldens byte-for-byte despite the interruption
    goldens = golden_outputs()
    got = {r["url"]: r["markdown"] for r in final.collect()}
    for url, g in goldens.items():
        assert got[url] == g["markdown"], url


def test_lineage_rows_written(spark, fixture_pages_path, tmp_path):
    out_dir = str(tmp_path / "job_lineage")
    job = CheckpointedExtractJob(
        spark, fixture_pages_path, out_dir, n_buckets=4, n_groups=2
    )
    job.run()
    lineage = spark.read.parquet(job.lineage_path)
    rows = lineage.collect()
    assert rows, "lineage table must not be empty"
    cols = set(lineage.columns)
    assert {"partition_id", "url_range", "doc_count", "bytes_in",
            "bytes_out", "wall_ms", "run_id", "ts"} <= cols
    total_docs = sum(r["doc_count"] for r in rows)
    n_out = spark.read.parquet(job.out_path).count()
    assert total_docs == n_out
    assert all(r["bytes_in"] > 0 for r in rows)
    assert any(r["bytes_out"] > 0 for r in rows)


def test_bucketed_input_layout_prunes_and_matches(spark, fixture_pages_path, tmp_path):
    """A pages table physically partitioned by the logical bucket column
    (sources.pages.with_bucket at write time) must (a) partition-prune the
    per-commit-group scan — at 100 TB that is one total scan instead of
    n_groups full scans — and (b) produce output identical to the
    unbucketed path."""
    from pyspark.sql import functions as F

    from paper2llm_spark.sources.pages import with_bucket

    n_buckets = 4
    bucketed_path = str(tmp_path / "pages_bucketed")
    pages = spark.read.parquet(fixture_pages_path)
    with_bucket(pages, n_buckets).write.partitionBy("bucket").parquet(bucketed_path)

    # (a) the group filter reaches the scan as a partition filter
    scan = spark.read.parquet(bucketed_path).filter(F.col("bucket").isin([0, 2]))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "bucket" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0], plan

    # (b) end-to-end output matches the goldens byte-for-byte
    out_dir = str(tmp_path / "job_bucketed")
    job = CheckpointedExtractJob(
        spark, bucketed_path, out_dir, n_buckets=n_buckets, n_groups=2
    )
    job.run()
    assert job.completed_buckets() == set(range(n_buckets))
    final = spark.read.parquet(job.out_path)
    goldens = golden_outputs()
    got = {r["url"]: r["markdown"] for r in final.collect()}
    for url, g in goldens.items():
        assert got[url] == g["markdown"], url
