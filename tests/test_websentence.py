"""Sentence stats: segmentation cases (terminators, no-terminator,
abbrev-adjacent), exact means, long-run-on share, zero-exchange plan."""

from __future__ import annotations

from paper2llm_spark.operators.websentence import (
    LONG_WORDS, MICRO, sentence_stats, sentence_stats_frame,
)


def _rows(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    return {r.doc_id: r for r in sentence_stats_frame(docs).collect()}


def test_segmentation_and_means(spark):
    """'Hi there. Bye now! Ok? end' -> sentences of 2/2/1/1 words
    (the final fragment has no terminator but still counts)."""
    rows = _rows(spark, ["Hi there. Bye now! Ok? end"])
    r = rows[0]
    assert r.n_sentences == 4
    assert r.max_words == 2
    assert r.mean_words_micro == 6 * MICRO // 4
    assert r.long_share_micro == 0


def test_no_terminator_is_one_sentence(spark):
    rows = _rows(spark, ["just a fragment with no end"])
    assert rows[0].n_sentences == 1
    assert rows[0].max_words == 6


def test_terminator_without_space_does_not_split(spark):
    """'3.14 v1.2' must stay one sentence — the boundary needs
    '<term><space>'."""
    rows = _rows(spark, ["pi is 3.14 and v1.2 shipped"])
    assert rows[0].n_sentences == 1


def test_long_share(spark):
    long_sent = " ".join(["w"] * (LONG_WORDS + 1))
    rows = _rows(spark, [f"{long_sent}. short one."])
    r = rows[0]
    assert r.n_sentences == 2
    assert r.long_share_micro == MICRO // 2
    assert r.max_words == LONG_WORDS + 1


def test_empty_and_blank_drop(spark):
    rows = _rows(spark, ["", "   ", "real. text."])
    assert set(rows) == {2}


def test_plan_zero_exchange(spark):
    """The whole battery is scan-side HOFs: no shuffle, no join, no
    Python anywhere."""
    df = sentence_stats(spark, "/root/testdata/sf0.001")
    assert df.count() == 500
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the repartition() in the loader is the only allowed exchange
    assert plan.count("Exchange") <= 1
    assert "Join" not in plan
    assert "HashAggregate" not in plan
