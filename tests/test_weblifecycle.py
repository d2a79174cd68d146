"""Growth accounting — hand state machine, full Python replay, and
the MAU-accounting identities."""

from __future__ import annotations

import datetime

import pandas as pd

from paper2llm_spark.operators.weblifecycle import (
    WEEK_EPOCH, lifecycle_states, lifecycle_states_frame,
)

SF = "/root/testdata/sf0.001"
_EPOCH = datetime.date(1970, 1, 5)


def _week(d: datetime.date) -> int:
    return (d - _EPOCH).days // 7


def test_hand_state_machine(spark):
    # user 1 active weeks {0, 1, 3} (none sparsified: (31+w)%5 != 0):
    # new@0, retained@1, churned@2, resurrected@3, churned@4
    rows = [
        (i,
         datetime.datetime.combine(
             _EPOCH + datetime.timedelta(weeks=w), datetime.time(12)
         ),
         1)
        for i, w in enumerate([0, 1, 3])
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )
    got = {(r.week, r.state): r.n
           for r in lifecycle_states_frame(events).collect()}
    assert got == {
        (0, "new"): 1, (1, "retained"): 1, (2, "churned"): 1,
        (3, "resurrected"): 1, (4, "churned"): 1,
    }


def _python_cells() -> dict:
    ev = pd.read_parquet(f"{SF}/events.parquet")
    active: dict[int, set] = {}
    for u, ts in zip(ev["user_id"], ev["ts"]):
        w = _week(ts.date())
        if (int(u) * 31 + w) % 5 == 0:
            continue
        active.setdefault(int(u), set()).add(w)
    max_week = max(w for s in active.values() for w in s)
    cells: dict[tuple, int] = {}

    def bump(week, state):
        cells[(week, state)] = cells.get((week, state), 0) + 1

    for u, ws in active.items():
        seq = sorted(ws)
        for i, w in enumerate(seq):
            if i == 0:
                bump(w, "new")
            elif seq[i - 1] == w - 1:
                bump(w, "retained")
            else:
                bump(w, "resurrected")
            nxt = seq[i + 1] if i + 1 < len(seq) else None
            if (nxt is None or nxt > w + 1) and w + 1 <= max_week + 1:
                bump(w + 1, "churned")
    return cells


def test_full_python_replay_and_identities(spark):
    cells = _python_cells()
    got = {(r.week, r.state): r.n
           for r in lifecycle_states(spark, SF).collect()}
    assert got == cells
    # all four states fire on the sparsified fixture
    assert {s for _, s in got} == {"new", "retained", "resurrected",
                                   "churned"}
    weeks = sorted({w for w, _ in got})
    act = {
        w: sum(got.get((w, s), 0)
               for s in ("new", "retained", "resurrected"))
        for w in weeks
    }
    for w in weeks:
        if w - 1 in act:
            churn = got.get((w, "churned"), 0)
            assert churn == act[w - 1] - got.get((w, "retained"), 0), w
