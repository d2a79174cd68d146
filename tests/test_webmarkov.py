"""Event transition matrix — full Python replay and stochastic-row
invariants."""

from __future__ import annotations

import pandas as pd

from paper2llm_spark.operators.webmarkov import MICRO, markov_transitions

SF = "/root/testdata/sf0.001"


def test_full_python_replay(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    cells: dict[tuple, int] = {}
    for _, grp in ev.groupby("user_id"):
        types = list(grp["event_type"])
        for a, b in zip(types, types[1:]):
            cells[(a, b)] = cells.get((a, b), 0) + 1
    rows = markov_transitions(spark, SF).collect()
    got = {(r.prev_type, r.next_type): r.n for r in rows}
    assert got == cells
    totals: dict[str, int] = {}
    for (a, _), n in cells.items():
        totals[a] = totals.get(a, 0) + n
    for r in rows:
        assert r.prob_micro == r.n * MICRO // totals[r.prev_type]


def test_rows_are_stochastic(spark):
    rows = markov_transitions(spark, SF).collect()
    by_prev: dict[str, list] = {}
    for r in rows:
        by_prev.setdefault(r.prev_type, []).append(r)
    assert len(by_prev) > 1
    for prev, rs in by_prev.items():
        tot = sum(r.prob_micro for r in rs)
        assert MICRO - len(rs) < tot <= MICRO, prev
