"""Lexical diversity: hand-computed Yule's K / TTR / hapax on known
token multisets, polarity on repetitive vs unique text."""

from __future__ import annotations

from pyspark.sql import functions as F

from paper2llm_spark.operators.weblexdiv import (
    MICRO, YULE_SCALE, lexical_diversity, lexical_diversity_frame,
)


def _rows(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    return {r.doc_id: r for r in lexical_diversity_frame(docs).collect()}


def test_hand_computed(spark):
    """'a a a b' -> N=4 V=2 S2=10 hapax=1:
    TTR = 2e6//4, hapax = 1e6//2, K = 1e6*(10-4)//16."""
    rows = _rows(spark, ["a a a b"])
    r = rows[0]
    assert (r.n_tokens, r.n_types) == (4, 2)
    assert r.ttr_micro == 2 * MICRO // 4
    assert r.hapax_ratio_micro == MICRO // 2
    assert r.yule_k_centi == YULE_SCALE * (10 - 4) // 16


def test_polarity(spark):
    """All-unique text: K = 0, TTR = 1e6, hapax = 1e6.  Single repeated
    token: K maximal (1e6 * (N²-N)/N²), TTR minimal."""
    rows = _rows(spark, ["w x y z", "q q q q q"])
    uniq, rep = rows[0], rows[1]
    assert uniq.yule_k_centi == 0
    assert uniq.ttr_micro == MICRO and uniq.hapax_ratio_micro == MICRO
    assert rep.n_types == 1 and rep.hapax_ratio_micro == 0
    assert rep.yule_k_centi == YULE_SCALE * (25 - 5) // 25
    assert rep.ttr_micro == MICRO // 5


def test_empty_text_emits_no_row(spark):
    rows = _rows(spark, ["", "   ", "one"])
    assert set(rows) == {2}


def test_corpus_plan_zero_joins(spark):
    df = lexical_diversity(spark, "/root/testdata/sf0.001")
    assert df.count() == 500
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
