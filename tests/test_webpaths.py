"""Top session paths — full Python replay of sessionization, capping
and ranking."""

from __future__ import annotations

import datetime

import pandas as pd

from paper2llm_spark.operators.webpaths import (
    MICRO, PATH_CAP, PATH_GAP_HOURS, TOP_N, top_paths,
)

SF = "/root/testdata/sf0.001"


def _python_paths() -> tuple[dict, int]:
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    counts: dict[str, int] = {}
    total = 0
    gap = datetime.timedelta(hours=PATH_GAP_HOURS)
    for _, grp in ev.groupby("user_id"):
        cur: list[str] = []
        prev = None
        for ts, et in zip(grp["ts"], grp["event_type"]):
            if prev is not None and ts - prev > gap:
                path = ">".join(cur[:PATH_CAP])
                counts[path] = counts.get(path, 0) + 1
                total += 1
                cur = []
            cur.append(et)
            prev = ts
        if cur:
            path = ">".join(cur[:PATH_CAP])
            counts[path] = counts.get(path, 0) + 1
            total += 1
    return counts, total


def test_full_python_replay(spark):
    counts, total = _python_paths()
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_N]
    rows = sorted(top_paths(spark, SF).collect(), key=lambda r: r.rank)
    assert [(r.path, r.n_sessions) for r in rows] == want
    for r in rows:
        assert r.share_micro == r.n_sessions * MICRO // total
        assert len(r.path.split(">")) <= PATH_CAP
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    # multiple distinct paths exist and the cap actually bites on the
    # fixture (some session has >= PATH_CAP events)
    assert len(rows) > 1
    assert any(len(r.path.split(">")) == PATH_CAP for r in rows)
