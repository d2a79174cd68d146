"""UniMax allocation: exact greedy replay on toy distributions, cap /
water-level polarity, budget conservation, bounded-window plan."""

from __future__ import annotations

from paper2llm_spark.operators.webunimax import (
    BUDGET_PCT, EPOCH_CAP, MICRO, unimax_alloc, unimax_frame,
)


def _alloc(spark, lang_tokens):
    texts = [
        (i, lang, " ".join(f"w{i}t{j}" for j in range(n)))
        for i, (lang, n) in enumerate(lang_tokens)
    ]
    docs = spark.createDataFrame(
        texts, "doc_id long, lang string, text string")
    return {r.lang: r for r in unimax_frame(docs).collect()}


def test_both_polarities_and_conservation(spark):
    """Tail language pins at EPOCH_CAP epochs; head languages level
    below 1 epoch-cap; total allocation == budget exactly."""
    rows = _alloc(spark, [("aa", 10), ("bb", 100), ("cc", 100)])
    total = 210
    b = (total * BUDGET_PCT) // 100   # 588
    assert rows["aa"].alloc_tokens == EPOCH_CAP * 10  # capped: 40
    assert rows["aa"].epochs_micro == EPOCH_CAP * MICRO
    water = b - 40
    assert rows["bb"].alloc_tokens + rows["cc"].alloc_tokens == water
    assert abs(rows["bb"].alloc_tokens - rows["cc"].alloc_tokens) <= 1
    assert rows["bb"].epochs_micro < EPOCH_CAP * MICRO
    assert sum(r.alloc_tokens for r in rows.values()) == b


def test_never_exceeds_cap(spark):
    rows = _alloc(spark, [("aa", 5), ("bb", 7), ("cc", 50), ("dd", 60)])
    for r in rows.values():
        assert r.alloc_tokens <= r.cap
        assert r.cap == EPOCH_CAP * r.n_tokens


def test_all_capped_when_budget_exceeds_capacity(spark):
    """One language: budget 2.8x > cap? cap = 4x tokens > 2.8x budget,
    so the single language water-levels to the whole budget."""
    rows = _alloc(spark, [("aa", 100)])
    b = (100 * BUDGET_PCT) // 100
    assert rows["aa"].alloc_tokens == min(b, EPOCH_CAP * 100)


def test_corpus_boundary_strictly_inside(spark):
    """On the synthetic corpus the en/tail skew puts the cap boundary
    strictly inside the language list — both branches driver-certified."""
    rows = unimax_alloc(spark, "/root/testdata/sf0.001").collect()
    capped = [r for r in rows if r.alloc_tokens == r.cap]
    leveled = [r for r in rows if r.alloc_tokens < r.cap]
    assert capped and leveled
    assert {r.lang for r in leveled} >= {"en"}
    total = sum(r.n_tokens for r in rows)
    b = total * BUDGET_PCT // 100
    assert sum(r.alloc_tokens for r in rows) == b


def test_plan_no_driver_collect(spark):
    """Scalars re-enter via broadcast; the only corpus-sized exchange
    is the groupBy(lang) count."""
    df = unimax_alloc(spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "Window" in plan
