"""Luhn significant-sentence scoring — hand-computed span clustering."""

from __future__ import annotations

from paper2llm_spark.operators.websummary import luhn_frame, luhn_summary


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in luhn_frame(df).collect()}


def test_luhn_span_clustering_hand_computed(spark):
    # sentence 0 tokens: alpha beta alpha beta gap1..gap5 alpha.
    # doc freqs: alpha=2, beta=2 (">=2" significant), 'alpha.' is a
    # DIFFERENT whitespace token (freq 1), gaps are freq 1, 'the' is a
    # stopword despite freq 3.  Significant positions in sentence 0:
    # [0,1,2,3] -> one span, cnt=4, len=4 -> 16e6 div 4 = 4_000_000.
    text = ("alpha beta alpha beta gap1 gap2 gap3 gap4 gap5 alpha. "
            "the the the.")
    got = _run(spark, [(0, text)])[0]
    assert (got.n_sents, got.n_sig) == (2, 2)
    assert (got.best_sent, got.best_score_micro) == (0, 4_000_000)


def test_luhn_gap_rule_splits_spans(spark):
    # z appears at positions 0 and 6 of one sentence: gap of 5
    # insignificant words > 4 -> TWO singleton spans, each 1e6;
    # at positions 0 and 5 (gap 4) -> ONE span cnt=2 len=6 ->
    # 4e6 div 6 = 666_666.
    far = _run(spark, [(0, "z a1 a2 a3 a4 a5 z end.")])[0]
    assert far.best_score_micro == 1_000_000
    near = _run(spark, [(0, "z a1 a2 a3 a4 z end.")])[0]
    assert near.best_score_micro == 4_000_000 // 6


def test_luhn_no_significant_words_sentinel(spark):
    got = _run(spark, [(0, "u1 u2 u3.")])[0]
    assert (got.n_sents, got.n_sig, got.best_sent,
            got.best_score_micro) == (1, 0, -1, 0)


def test_luhn_tie_prefers_lower_sentence(spark):
    # both sentences score 2e6 (cnt 2, len 2) -> winner is sentence 0
    got = _run(spark, [(0, "z z. z z.")])[0]
    assert (got.best_sent, got.best_score_micro) == (0, 2_000_000)


def test_registered_query_plants_sentinel_polarity(spark):
    rows = luhn_summary(spark, "/root/testdata/sf0.001").collect()
    planted = [r for r in rows if r.doc_id >= 50_000_000]
    assert planted and all(
        (r.n_sig, r.best_sent, r.best_score_micro) == (0, -1, 0)
        for r in planted
    )
    assert any(r.best_score_micro > 0 for r in rows)
