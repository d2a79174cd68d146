"""WAU/MAU stickiness — full Python replay over the sparsified grid
and ratio invariants."""

from __future__ import annotations

import pandas as pd

from paper2llm_spark.operators.webstickiness import (
    MAU_WEEKS, MICRO, stickiness,
)
from paper2llm_spark.operators.weblifecycle import WEEK_EPOCH

SF = "/root/testdata/sf0.001"


def test_full_python_replay_and_ratio(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    epoch = pd.Timestamp(WEEK_EPOCH).date()
    grid = set()
    for u, ts in zip(ev["user_id"], ev["ts"]):
        w = (ts.date() - epoch).days // 7
        if (int(u) * 31 + w) % 5 != 0:
            grid.add((int(u), w))
    weeks = {w for _, w in grid}
    wau = {w: sum(1 for _, x in grid if x == w) for w in weeks}
    mau = {
        w: len({u for u, x in grid if w - MAU_WEEKS < x <= w})
        for w in weeks
    }
    rows = {r.week: r for r in stickiness(spark, SF).collect()}
    assert set(rows) == weeks
    for w in weeks:
        r = rows[w]
        assert (r.wau, r.mau) == (wau[w], mau[w]), w
        assert r.stickiness_micro == wau[w] * MICRO // mau[w]
        assert r.wau <= r.mau
    # the sparsified fixture produces a non-constant ratio
    assert len({r.stickiness_micro for r in rows.values()}) > 1
