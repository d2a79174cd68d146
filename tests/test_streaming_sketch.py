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


def test_cms_never_undercounts_and_tight_for_heavy_keys(spark):
    """Count-Min guarantee per window: the point estimate is >= the
    true count for every user, and within the e/w overcount bound of
    the window's total events (3 independent rows make gross
    overcounts vanishingly rare on this cardinality)."""
    import math

    from paper2llm_spark.streaming.sketch import (
        CMS_STREAM_W,
        cms_estimate,
        windowed_cms_counters,
    )
    from paper2llm_spark.streaming.windows import EVENTS_SCHEMA

    events = spark.read.parquet(f"{SF}/events.parquet").select(
        *[f.name for f in EVENTS_SCHEMA.fields]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    counters: dict = {}
    totals: dict = {}
    for r in windowed_cms_counters(events).collect():
        win = (r["win_start"], r["win_end"])
        counters.setdefault(win, {})[(r["row_idx"], r["bucket"])] = r["cnt"]
        if r["row_idx"] == 0:
            totals[win] = totals.get(win, 0) + r["cnt"]
    truth_rows = (
        events.groupBy(F.window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("ws"),
            F.col("w.end").cast("timestamp_ntz").alias("we"),
            "user_id", "n",
        )
        .collect()
    )
    checked = 0
    for r in truth_rows:
        win = (r["ws"], r["we"])
        if win not in counters:
            continue
        est = cms_estimate(counters[win], str(r["user_id"]))
        assert est >= r["n"], (win, r["user_id"], est, r["n"])
        bound = r["n"] + 3 * math.e / CMS_STREAM_W * totals[win]
        assert est <= bound, (win, r["user_id"], est, bound)
        checked += 1
    assert checked > 100


def test_cms_drained_stream_equals_batch_counters(spark, tmp_path):
    """availableNow drain == batch aggregate on the closed window set
    (the dual contract), and per-window state is d*w-bounded."""
    from paper2llm_spark.streaming.sketch import (
        CMS_STREAM_D,
        CMS_STREAM_W,
        start_windowed_cms,
        windowed_cms_counters,
    )
    from paper2llm_spark.streaming.windows import EVENTS_SCHEMA

    in_dir = str(tmp_path / "ev")
    events = spark.read.parquet(f"{SF}/events.parquet").select(
        *[f.name for f in EVENTS_SCHEMA.fields]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    events.coalesce(2).write.parquet(in_dir)

    q = start_windowed_cms(spark, in_dir, query_name="p2l_cms_t")
    q.awaitTermination()
    got = {
        (r["win_start"], r["win_end"], r["row_idx"], r["bucket"]): r["cnt"]
        for r in spark.table("p2l_cms_t").collect()
    }
    assert got, "no windows emitted"

    max_ts = events.agg(F.max("ts")).collect()[0][0]
    batch = {
        (r["win_start"], r["win_end"], r["row_idx"], r["bucket"]): r["cnt"]
        for r in windowed_cms_counters(events).collect()
        if (max_ts - r["win_end"]).total_seconds() >= 600
    }
    assert got == batch
    per_win: dict = {}
    for (ws, we, _j, _b) in got:
        per_win[(ws, we)] = per_win.get((ws, we), 0) + 1
    assert max(per_win.values()) <= CMS_STREAM_D * CMS_STREAM_W
