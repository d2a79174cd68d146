"""CUSUM burst detection — hand-computed charts (reflection identity)
and planted-burst separation."""

from __future__ import annotations

import datetime

from paper2llm_spark.operators.webcusum import cusum_anomaly, cusum_frame

H0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, spec):
    """spec: {type: {hour_offset: count}} -> events frame."""
    rows = []
    for t, hours in spec.items():
        for h, n in hours.items():
            for _ in range(n):
                rows.append((t, H0 + datetime.timedelta(hours=h)))
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


def test_cusum_hand_computed_spike(spark):
    # counts [2,2,2,15,2]: total 23, k = 23000 div 5 + 1500 = 6100
    # P = [-4100,-8200,-12300,-3400,-7500], running-min reflection ->
    # S = [0,0,0,8900,4800]; only hour 3 crosses h=8000
    df = _ev(spark, {"a": {0: 2, 1: 2, 2: 2, 3: 15, 4: 2}})
    got = sorted(
        (r.hour_idx, r.n_events, r.cusum_milli, r.alarm)
        for r in cusum_frame(df).collect()
    )
    base = got[0][0]
    assert [(h - base, n, s, a) for h, n, s, a in got] == [
        (0, 2, 0, False), (1, 2, 0, False), (2, 2, 0, False),
        (3, 15, 8900, True), (4, 2, 4800, False),
    ]


def test_cusum_dense_spine_fills_missing_hours(spark):
    # events only at hour 0 and 3: the chart still carries 4 rows and
    # drains through the silent hours (k = 10000 div 4 + 1500 = 4000)
    df = _ev(spark, {"b": {0: 5, 3: 5}})
    got = sorted(
        (r.hour_idx, r.n_events, r.cusum_milli)
        for r in cusum_frame(df).collect()
    )
    base = got[0][0]
    assert [(h - base, n, s) for h, n, s in got] == [
        (0, 5, 1000), (1, 0, 0), (2, 0, 0), (3, 5, 1000),
    ]


def test_planted_burst_separates_from_baseline(spark):
    rows = cusum_anomaly(spark, "/root/testdata/sf0.001").collect()
    alarms = {}
    for r in rows:
        alarms[r.event_type] = alarms.get(r.event_type, 0) + bool(r.alarm)
    assert alarms["click"] > 0
    assert all(v == 0 for t, v in alarms.items() if t != "click")
