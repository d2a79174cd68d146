"""Source entropy: hand-computed uniform/degenerate cases, invariance,
single-exchange plan."""

from __future__ import annotations

import math

from paper2llm_spark.operators.webdiversity import (
    MICRO, source_entropy, source_entropy_frame,
)


def _rows(spark, pairs):
    docs = spark.createDataFrame(pairs, "lang string, source string")
    return {r.lang: r for r in source_entropy_frame(docs).collect()}


def test_uniform_two_sources(spark):
    """2 sources x 2 docs each -> H = ln 2 exactly (every term is the
    same quantized mnat), top share = 1/2."""
    rows = _rows(
        spark,
        [("en", "a"), ("en", "a"), ("en", "b"), ("en", "b")],
    )
    r = rows["en"]
    mnat = math.floor(math.log(2.0) * MICRO + 0.5)
    assert r.entropy_micro_nats == (2 * mnat + 2 * mnat) // 4
    assert r.n_docs == 4 and r.n_sources == 2
    assert r.top_share_micro == MICRO // 2


def test_single_source_zero_entropy(spark):
    rows = _rows(spark, [("fr", "x")] * 5)
    r = rows["fr"]
    assert r.entropy_micro_nats == 0
    assert r.top_share_micro == MICRO
    assert r.n_sources == 1


def test_concentration_orders_entropy(spark):
    """A 9:1 split has lower entropy than a 5:5 split."""
    rows = _rows(
        spark,
        [("a", "s1")] * 9 + [("a", "s2")]
        + [("b", "s1")] * 5 + [("b", "s2")] * 5,
    )
    assert rows["a"].entropy_micro_nats < rows["b"].entropy_micro_nats
    assert rows["a"].top_share_micro == 9 * MICRO // 10


def test_corpus_plan_one_corpus_exchange(spark):
    df = source_entropy(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_sources >= 2 and r.entropy_micro_nats > 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # corpus-sized exchange on (lang, source); the window/final agg run
    # on the cell table
    assert "hashpartitioning(lang" in plan
