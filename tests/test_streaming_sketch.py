"""Streaming per-window HLL registers — semantics beyond the driver's
hash gate: estimator accuracy vs true distinct counts, batch
equivalence, bounded state."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_estimator_within_published_band(spark):
    """For every emitted window the HLL estimate must sit inside
    3 * 1.04/sqrt(m) of the true distinct user count (the 99.7% band
    of Flajolet et al.'s sigma) — the accuracy contract that makes the
    registers useful."""
    from paper2llm_spark.streaming.sketch import (
        HLL_STREAM_M,
        hll_estimate,
        windowed_hll_registers,
    )
    from paper2llm_spark.streaming.windows import EVENTS_SCHEMA

    events = spark.read.parquet(f"{SF}/events.parquet").select(
        *[f.name for f in EVENTS_SCHEMA.fields]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    regs = windowed_hll_registers(events).collect()
    by_win: dict = {}
    for r in regs:
        by_win.setdefault((r["win_start"], r["win_end"]), []).append(
            r["max_rank"]
        )
    truth = {
        (r["win_start"], r["win_end"]): r["n"]
        for r in events.groupBy(
            F.window("ts", "5 minutes").alias("w")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("win_start"),
            F.col("w.end").cast("timestamp_ntz").alias("win_end"),
            "n",
        )
        .collect()
    }
    assert by_win and set(by_win) <= set(truth)
    sigma = 1.04 / (HLL_STREAM_M ** 0.5)
    for win, ranks in by_win.items():
        est, true = hll_estimate(ranks), truth[win]
        assert abs(est - true) <= 3 * sigma * true + 2, (win, est, true)


def test_drained_stream_equals_batch_registers(spark, tmp_path):
    """availableNow drain == batch aggregate on the closed window set
    (the dual contract), and per-window state is register-bounded."""
    from paper2llm_spark.streaming.sketch import (
        HLL_STREAM_M,
        start_windowed_hll,
        windowed_hll_registers,
    )
    from paper2llm_spark.streaming.windows import EVENTS_SCHEMA

    in_dir = str(tmp_path / "ev")
    events = spark.read.parquet(f"{SF}/events.parquet").select(
        *[f.name for f in EVENTS_SCHEMA.fields]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    events.coalesce(2).write.parquet(in_dir)

    q = start_windowed_hll(spark, in_dir, query_name="p2l_hll_t")
    q.awaitTermination()
    got = {
        (r["win_start"], r["win_end"], r["bucket"]): r["max_rank"]
        for r in spark.table("p2l_hll_t").collect()
    }
    assert got, "no windows emitted"

    max_ts = events.agg(F.max("ts")).collect()[0][0]
    batch = {
        (r["win_start"], r["win_end"], r["bucket"]): r["max_rank"]
        for r in windowed_hll_registers(events).collect()
        if (max_ts - r["win_end"]).total_seconds() >= 600
    }
    assert got == batch
    # bounded state: never more than m register rows per window
    per_win: dict = {}
    for (ws, we, _b) in got:
        per_win[(ws, we)] = per_win.get((ws, we), 0) + 1
    assert max(per_win.values()) <= HLL_STREAM_M
