"""Retention cohorts — semantics beyond the driver's hash gate:
handcrafted cohort grid, decay behavior, invariants."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _run(spark, rows):
    from paper2llm_spark.operators.webcohort import retention_cohorts_frame

    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    return {
        (r["cohort_week"], r["week_offset"]):
            (r["n_users"], r["cohort_size"], r["retention_micro"])
        for r in retention_cohorts_frame(df).collect()
    }


def _ev(i, day, user, value=200.0):
    return (i, dt.datetime(2024, 1, day, 12, 0, 0), user, value)


def test_handcrafted_cohort_grid(spark):
    # week of Jan 1 (Mon) and week of Jan 8: users 1,2 start wk0;
    # user 3 starts wk1. user 1 active wk0+wk1, user 2 only wk0.
    rows = [
        _ev(0, 1, 1), _ev(1, 2, 2),        # wk0 cohort: users 1, 2
        _ev(2, 9, 1),                       # user 1 returns in wk1
        _ev(3, 10, 3),                      # wk1 cohort: user 3
        _ev(4, 3, 9, value=10.0),           # below threshold: invisible
    ]
    got = _run(spark, rows)
    assert got == {
        ("2024-01-01", 0): (2, 2, 1_000_000),
        ("2024-01-01", 1): (1, 2, 500_000),
        ("2024-01-08", 0): (1, 1, 1_000_000),
    }


def test_one_user_counts_once_per_week(spark):
    rows = [_ev(i, 1 + (i % 3), 1) for i in range(9)]  # 9 events, 1 user, wk0
    got = _run(spark, rows)
    assert got == {("2024-01-01", 0): (1, 1, 1_000_000)}


def test_corpus_curve_decays_from_full(spark):
    from paper2llm_spark.operators.webcohort import retention_cohorts

    rows = retention_cohorts(spark, SF).collect()
    assert len(rows) >= 8
    by_cohort: dict[str, dict[int, int]] = {}
    for r in rows:
        assert r["n_users"] <= r["cohort_size"]
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = \
            r["retention_micro"]
    for cw, curve in by_cohort.items():
        assert curve[0] == 1_000_000, cw        # offset 0 is by definition 1
    # the fixture's thinned activity must actually decay somewhere
    assert any(
        v < 1_000_000 for c in by_cohort.values()
        for k, v in c.items() if k > 0
    )


def test_qualifying_filter_pushed_to_scan(spark):
    from paper2llm_spark.operators.webcohort import retention_cohorts

    plan = retention_cohorts(
        spark, SF
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    assert "value" in pushed, pushed
    # props payload never read
    for rs in plan.split("ReadSchema: ")[1:]:
        assert "props" not in rs.splitlines()[0]
