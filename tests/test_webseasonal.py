"""Seasonal-naive baseline — full Python replay over the dense
hourly grid."""

from __future__ import annotations

import datetime

import pandas as pd

from paper2llm_spark.operators.webseasonal import (
    MICRO, PERIOD_H, seasonal_naive,
)

SF = "/root/testdata/sf0.001"
_EPOCH = datetime.date(1970, 1, 1)


def test_full_python_replay(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    counts: dict[tuple, int] = {}
    hours = []
    for et, ts in zip(ev["event_type"], ev["ts"]):
        h = (ts.date() - _EPOCH).days * 24 + ts.hour
        hours.append(h)
        counts[(et, h)] = counts.get((et, h), 0) + 1
    h0, h1 = min(hours), max(hours)
    types = sorted({et for et, _ in counts})
    want = {}
    for et in types:
        n = tot = sabs = serr = 0
        for h in range(h0 + PERIOD_H, h1 + 1):
            c = counts.get((et, h), 0)
            p = counts.get((et, h - PERIOD_H), 0)
            n += 1
            tot += c
            sabs += abs(c - p)
            serr += c - p
        want[et] = (n, tot, sabs * MICRO // n, serr)
    rows = {r.event_type: r for r in seasonal_naive(spark, SF).collect()}
    assert set(rows) == set(types)
    for et, (n, tot, mae, serr) in want.items():
        r = rows[et]
        assert (r.n_hours, r.total_actual, r.mae_micro, r.sum_err) == (
            n, tot, mae, serr), et
    # signed errors exist in both directions across types on the fixture
    errs = [r.sum_err for r in rows.values()]
    assert any(e > 0 for e in errs) and any(e < 0 for e in errs)
