"""Stream-stream interval join — semantics beyond the driver's hash
gate: cross-micro-batch matching (state retention), append-mode
exactly-once, batch equivalence under multi-wave drains."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _stage_ordered_waves(spark, n_waves: int) -> str:
    """Write the events as n_waves TIME-CONTIGUOUS files with
    increasing mtimes — a realistic roughly-in-order stream.  (A
    time-shuffled file order would be a stream arriving a month late:
    after wave 1 the watermark sits at max(ts)-60min and every later
    wave is correctly DROPPED — watermark semantics, not a bug.)"""
    import time

    import numpy as np

    from paper2llm_spark.streaming.windows import EVENTS_SCHEMA

    in_dir = os.path.join(tempfile.gettempdir(), "p2l_ssj_test")
    shutil.rmtree(in_dir, ignore_errors=True)
    pdf = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(*[f.name for f in EVENTS_SCHEMA.fields])
        .toPandas()
        .sort_values("ts")
    )
    base = time.time() - 10 * n_waves
    for w, chunk in enumerate(np.array_split(pdf, n_waves)):
        spark.createDataFrame(chunk, EVENTS_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(in_dir)
        # EXPLICIT increasing mtimes: FileStreamSource orders waves by
        # modification time, and sub-second writes can collide — an
        # out-of-order wave lands behind the watermark and is dropped
        for f in os.listdir(in_dir):
            p = os.path.join(in_dir, f)
            if f.endswith(".parquet") and os.path.getmtime(p) > base + 10 * w:
                os.utime(p, (base + 10 * w, base + 10 * w))
    return in_dir


def _batch_pairs(spark):
    from paper2llm_spark.streaming.joins import interval_join_frame
    from paper2llm_spark.streaming.windows import EVENTS_SCHEMA

    src = spark.read.parquet(f"{SF}/events.parquet").select(
        *[f.name for f in EVENTS_SCHEMA.fields]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return {
        (r["view_id"], r["click_id"], r["lag_ms"])
        for r in interval_join_frame(src, src).collect()
    }


def test_multiwave_drain_matches_batch_join(spark):
    """8 time-ordered input files drained one per micro-batch: pairs
    whose view and click arrive in DIFFERENT batches only emit if the
    join state is retained across the watermark advance — the drained
    set must still equal the batch join, every pair exactly once."""
    from paper2llm_spark.streaming.joins import start_interval_join

    in_dir = _stage_ordered_waves(spark, n_waves=8)
    q = start_interval_join(
        spark, in_dir, query_name="p2l_ssj_waves", max_files_per_trigger=1
    )
    q.awaitTermination()
    rows = spark.table("p2l_ssj_waves").collect()
    got = [(r["view_id"], r["click_id"], r["lag_ms"]) for r in rows]
    want = _batch_pairs(spark)
    assert len(got) == len(set(got)), "duplicate emission"
    assert set(got) == want
    assert want, "vacuous: no attribution pairs at sf0.001"


def test_long_run_50_waves_state_bounded(spark):
    """Long-running-stream evidence (VERDICT r3 #8): ~50 micro-batches
    through the stream-stream join.  Two claims the availableNow gate
    never exercised: (1) the drained output still equals the batch
    join after 50 watermark advances; (2) join STATE is bounded by the
    JOIN_WINDOW+WATERMARK horizon, not by input size — the final
    state-store row count must be far below total input rows (without
    the watermarks Spark buffers both sides forever)."""
    from paper2llm_spark.streaming.joins import start_interval_join

    in_dir = _stage_ordered_waves(spark, n_waves=50)
    q = start_interval_join(
        spark, in_dir, query_name="p2l_ssj_long", max_files_per_trigger=1
    )
    q.awaitTermination()
    progress = q.lastProgress
    rows = spark.table("p2l_ssj_long").collect()
    got = [(r["view_id"], r["click_id"], r["lag_ms"]) for r in rows]
    want = _batch_pairs(spark)
    assert len(got) == len(set(got)), "duplicate emission"
    assert set(got) == want

    n_input = spark.read.parquet(f"{SF}/events.parquet").count()
    state_rows = sum(
        op["numRowsTotal"] for op in progress["stateOperators"]
    )
    # watermark eviction: buffered rows older than WATERMARK+JOIN_WINDOW
    # behind the max event time can never match and must be gone — the
    # retained state is the trailing horizon, a small fraction of the
    # replayed corpus (and the fraction SHRINKS as the corpus grows)
    assert 0 < state_rows < n_input / 2, (state_rows, n_input)


def test_lag_within_window_and_nonnegative(spark):
    pairs = _batch_pairs(spark)
    assert all(0 <= lag <= 60 * 60 * 1000 for _, _, lag in pairs)


def test_state_partitions_scoped_to_query(spark):
    """streaming/state.py contract: the query runs with the state-sized
    partition count (visible in its stateOperators progress) while the
    session keeps its batch shuffle width for concurrent batch work."""
    from paper2llm_spark.streaming.joins import start_interval_join
    from paper2llm_spark.streaming.state import STATE_PARTITIONS

    before = spark.conf.get("spark.sql.shuffle.partitions")
    in_dir = _stage_ordered_waves(spark, n_waves=2)
    q = start_interval_join(
        spark, in_dir, query_name="p2l_ssj_conf", max_files_per_trigger=64
    )
    # restore must have happened at start-return, not at termination
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    q.awaitTermination()
    ops = q.lastProgress["stateOperators"]
    assert ops and all(
        op["numShufflePartitions"] == STATE_PARTITIONS for op in ops
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
