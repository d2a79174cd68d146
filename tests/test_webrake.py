"""RAKE — phrase splitting on stopwords, deg/freq scoring, multiplicity,
tie-break, and the all-stopword drop."""

from __future__ import annotations

from paper2llm_spark.operators.webrake import rake_frame


def _top(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: (r.phrase, r.score_micro) for r in rake_frame(df).collect()}


def test_deg_freq_scoring_and_tie_break(spark):
    # "and" is a stopword -> phrases ["red apple"], ["green apple"].
    # freq: red 1, apple 2, green 1; deg: red 2, apple 4, green 2.
    # wscore = 2e6 each; both phrases score 4e6 -> lexicographic tie
    # break picks "green apple".
    got = _top(spark, ["red apple and green apple"])
    assert got[0] == ("green apple", 4_000_000)


def test_long_phrase_beats_short(spark):
    # "alpha beta gamma" (one 3-phrase) vs stopword-separated "delta":
    # each of alpha/beta/gamma scores 3e6 (deg 3 / freq 1) -> phrase 9e6;
    # delta scores 1e6. Top-1 is the long phrase (RAKE's documented bias).
    got = _top(spark, ["alpha beta gamma of delta"])
    assert got[0] == ("alpha beta gamma", 9_000_000)


def test_repeated_word_counts_with_multiplicity(spark):
    # "x x" is one phrase of length 2: freq(x)=2, deg(x)=4, wscore=2e6;
    # phrase score sums BOTH occurrences -> 4e6.
    got = _top(spark, ["x x"])
    assert got[0] == ("x x", 4_000_000)


def test_all_stopword_doc_yields_no_row(spark):
    got = _top(spark, ["the of and", "solo"])
    assert 0 not in got
    assert got[1] == ("solo", 1_000_000)
