"""Cohort LTV — full Python replay over the sparsified activity grid
and curve invariants."""

from __future__ import annotations

import math

import pandas as pd

from paper2llm_spark.operators.webltv import MICRO, cohort_ltv
from paper2llm_spark.operators.weblifecycle import WEEK_EPOCH

SF = "/root/testdata/sf0.001"


def _python_cells():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    epoch = pd.Timestamp(WEEK_EPOCH).date()
    grid: dict[tuple, int] = {}
    for u, ts, v in zip(ev["user_id"], ev["ts"], ev["value"]):
        w = (ts.date() - epoch).days // 7
        grid[(int(u), w)] = grid.get((int(u), w), 0) + int(
            math.floor(float(v) * 100 + 0.5)
        )
    grid = {k: c for k, c in grid.items() if (k[0] * 31 + k[1]) % 5 != 0}
    cohort = {}
    for (u, w) in grid:
        cohort[u] = min(cohort.get(u, w), w)
    cells: dict[tuple, list] = {}
    for (u, w), c in grid.items():
        key = (cohort[u], w - cohort[u])
        cells.setdefault(key, [0, 0])
        cells[key][0] += 1
        cells[key][1] += c
    sizes = {}
    for u, co in cohort.items():
        sizes[co] = sizes.get(co, 0) + 1
    return cells, sizes


def test_full_python_replay_and_curve(spark):
    cells, sizes = _python_cells()
    rows = {(r.cohort, r.age): r for r in cohort_ltv(spark, SF).collect()}
    assert set(rows) == set(cells)
    cum: dict[int, int] = {}
    for (co, age) in sorted(cells):
        n_active, cents = cells[(co, age)]
        cum[co] = cum.get(co, 0) + cents
        r = rows[(co, age)]
        assert (r.n_active, r.revenue_cents) == (n_active, cents)
        assert r.cum_revenue_cents == cum[co]
        assert r.ltv_microcents == cum[co] * MICRO // sizes[co]
    # multiple cohorts exist and every curve is nondecreasing
    assert len(sizes) >= 2
    for co in sizes:
        ages = sorted(a for (c, a) in rows if c == co)
        curve = [rows[(co, a)].cum_revenue_cents for a in ages]
        assert curve == sorted(curve)
        assert rows[(co, 0)].n_active == sizes[co]
