"""Semantic tests for the webstats operators (repetition quality stats,
decontamination, sessionization, as-of join, stratified sampling).

Cross-engine value equality vs DuckDB is covered for all five by the
parametrized oracle gate in test_driver_contract.py; these tests pin the
SEMANTICS on crafted inputs where the right answer is known by hand.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from paper2llm_spark.operators.webstats import (
    asof_join_frame,
    decontaminate,
    repetition_stats,
    sessionize_frame,
    stratified_sample,
)

EV_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double, props string"
)


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute, second)


def test_sessionize_gap_semantics(spark):
    rows = [
        # user 1: 10:00, 10:10 (same session), 10:50 (gap 40min -> new)
        (1, _ts(0), 1, "view", 1.0, ""),
        (2, _ts(10), 1, "view", 2.0, ""),
        (3, _ts(50), 1, "view", 4.0, ""),
        # user 2: exactly 30:00 gap -> NOT a break (strict >)
        (4, _ts(0), 2, "view", 1.5, ""),
        (5, _ts(30), 2, "view", 2.5, ""),
    ]
    out = sessionize_frame(spark.createDataFrame(rows, EV_SCHEMA))
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["sum_value"])
        for r in out.collect()
    }
    assert got == {
        (1, 1): (2, 3.0),
        (1, 2): (1, 4.0),
        (2, 1): (2, 4.0),
    }


def test_sessionize_session_bounds(spark):
    rows = [
        (1, _ts(0), 7, "view", 0.0, ""),
        (2, _ts(5), 7, "view", 0.0, ""),
    ]
    row = sessionize_frame(spark.createDataFrame(rows, EV_SCHEMA)).collect()[0]
    assert row["session_start"] == _ts(0)
    assert row["session_end"] == _ts(5)


def test_asof_inclusive_equal_ts_and_sentinel(spark):
    rows = [
        # click before any purchase -> sentinel
        (1, _ts(0), 1, "click", 0.0, ""),
        # purchase at the SAME ts as a click -> inclusive match
        (2, _ts(5), 1, "purchase", 0.0, ""),
        (3, _ts(5), 1, "click", 0.0, ""),
        # later click still sees the 10:05 purchase
        (4, _ts(9), 1, "click", 0.0, ""),
    ]
    out = asof_join_frame(spark.createDataFrame(rows, EV_SCHEMA))
    got = {r["click_id"]: (r["purchase_id"], r["purchase_ts"]) for r in out.collect()}
    assert got[1] == (-1, dt.datetime(1970, 1, 1))
    assert got[3] == (2, _ts(5))
    assert got[4] == (2, _ts(5))


def test_asof_tie_on_right_ts_takes_max_event_id(spark):
    rows = [
        (10, _ts(1), 1, "purchase", 0.0, ""),
        (11, _ts(1), 1, "purchase", 0.0, ""),  # same ts, higher id wins
        (12, _ts(2), 1, "click", 0.0, ""),
    ]
    out = asof_join_frame(spark.createDataFrame(rows, EV_SCHEMA))
    assert out.collect()[0]["purchase_id"] == 11


def test_asof_respects_user_partition(spark):
    rows = [
        (1, _ts(0), 1, "purchase", 0.0, ""),
        (2, _ts(5), 2, "click", 0.0, ""),  # other user's purchase invisible
    ]
    out = asof_join_frame(spark.createDataFrame(rows, EV_SCHEMA))
    assert out.collect()[0]["purchase_id"] == -1


def test_repetition_stats_known_doc(spark, tmp_path):
    # "a b a b c": 5 unigrams / 3 distinct {a,b,c}; bigrams a-b x2, b-a,
    # b-c; trigrams all distinct
    docs = spark.createDataFrame(
        [(0, "a b a b c", "en", "s", 9)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    path = str(tmp_path / "documents.parquet")
    docs.write.parquet(path)
    row = repetition_stats(spark, str(tmp_path)).collect()[0]
    assert row["n_tokens"] == 5
    assert row["n_distinct"] == 3
    assert row["dup_unigram_frac"] == 0.4
    assert row["top_bigram_frac"] == 0.8  # 2*2/5
    assert row["top_trigram_frac"] == 0.6  # 3*1/5


def test_decontaminate_nonvacuous_at_sf001(spark):
    out = decontaminate(spark, "/root/testdata/sf0.01")
    rows = out.collect()
    # every corpus doc is reported, hit or not
    assert len(rows) > 400
    hits = [r for r in rows if r["contaminated"]]
    assert hits, "benchmark overlap must flag at least one doc"
    assert all(r["n_hits"] == 0 for r in rows if not r["contaminated"])


def test_stratified_sample_rates(spark):
    out = stratified_sample(spark, "/root/testdata/sf0.01")
    rows = out.collect()
    assert rows
    # every sampled row respects its language's bucket cutoff
    rates = {"en": 500, "de": 400, "fr": 300, "es": 200}
    for r in rows:
        assert r["strat_bucket"] < rates.get(r["lang"], 100)


def test_funnel_ordered_steps_and_ties(spark):
    from datetime import datetime

    from paper2llm_spark.operators.webstats import funnel_frame

    E = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"

    def ev(i, ts, uid, typ):
        return (i, datetime(2024, 1, 1, 0, 0, ts), uid, typ, 0.0, "{}")

    rows = [
        # user 1: clean view -> click -> purchase
        ev(1, 1, 1, "view"), ev(2, 2, 1, "click"), ev(3, 3, 1, "purchase"),
        # user 2: purchase BEFORE click -> not converted
        ev(4, 1, 2, "view"), ev(5, 2, 2, "purchase"), ev(6, 3, 2, "click"),
        # user 3: click before any view -> funnel stops at view
        ev(7, 1, 3, "click"), ev(8, 2, 3, "view"),
        # user 4: equal-ts ties advance (inclusive semantics)
        ev(9, 5, 4, "view"), ev(10, 5, 4, "click"), ev(11, 5, 4, "purchase"),
    ]
    out = {r["user_id"]: r for r in funnel_frame(
        spark.createDataFrame(rows, E)).collect()}
    assert out[1]["converted"] is True
    assert out[2]["converted"] is False
    assert out[2]["click_ts"].second == 3  # the late click still matches
    assert out[3]["converted"] is False
    assert out[3]["click_ts"].year == 1970  # no click after the view
    assert out[4]["converted"] is True
    assert out[4]["view_ts"] == out[4]["click_ts"] == out[4]["purchase_ts"]
