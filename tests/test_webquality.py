"""Semantic tests for the quality rule batteries (Gopher §A1.1 rules,
C4 §2.2 line filters).

Cross-engine value equality vs DuckDB is covered by the parametrized
oracle gate in test_driver_contract.py; these pin the SEMANTICS on
crafted inputs where the right answer is known by hand.
"""

from __future__ import annotations

from paper2llm_spark.operators.webquality import (
    C4_MIN_KEPT_LINES,
    GOPHER_MIN_WORDS,
    c4_filter_frame,
    gopher_rules_frame,
)

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _doc(i, text):
    return (i, text, "en", "s0", len(text))


def _gopher(spark, rows):
    return {
        r["doc_id"]: r
        for r in gopher_rules_frame(
            spark.createDataFrame(rows, DOC_SCHEMA)
        ).collect()
    }


def test_gopher_good_doc_keeps(spark):
    # 60 words, avg length in [3,10], all alphabetic, has "the"
    good = " ".join(["the"] + ["word"] * (GOPHER_MIN_WORDS + 9))
    out = _gopher(spark, [_doc(1, good)])
    r = out[1]
    assert r["keep"] and all(
        r[f] for f in ("r_word_count", "r_word_len", "r_alpha", "r_symbol",
                       "r_stopwords")
    )
    assert r["n_words"] == GOPHER_MIN_WORDS + 10


def test_gopher_word_count_bounds(spark):
    short = " ".join(["the"] + ["word"] * 5)
    out = _gopher(spark, [_doc(1, short)])
    assert not out[1]["r_word_count"] and not out[1]["keep"]


def test_gopher_mean_word_length_bounds(spark):
    # 2-char words -> mean word length 2 < 3
    tiny = " ".join(["the"] + ["ab"] * (GOPHER_MIN_WORDS + 9))
    # 12-char words -> mean 12 > 10
    long_ = " ".join(["the"] + ["abcdefghijkl"] * (GOPHER_MIN_WORDS + 9))
    out = _gopher(spark, [_doc(1, tiny), _doc(2, long_)])
    assert not out[1]["r_word_len"] and not out[2]["r_word_len"]


def test_gopher_alpha_and_symbol_rules(spark):
    # 40% numeric words -> alpha ratio 0.6 < 0.8
    numeric = " ".join(
        ["the"] + ["word", "word", "123", "456"] * ((GOPHER_MIN_WORDS + 8) // 4)
    )
    # every 5th word is a '#'-prefixed tag -> symbol ratio 0.2 > 0.1
    hashy = " ".join(
        ["the"] + ["w1", "w2", "w3", "#tag"] * ((GOPHER_MIN_WORDS + 8) // 4)
    )
    out = _gopher(spark, [_doc(1, numeric), _doc(2, hashy)])
    assert not out[1]["r_alpha"]
    assert not out[2]["r_symbol"]


def test_gopher_empty_doc_is_null_safe(spark):
    # zero tokens: every ratio divides by n_words — must come back as
    # a well-defined 0.0/false row, never NULL (ADVICE r2: the 0/0)
    r = _gopher(spark, [_doc(1, "")])[1]
    assert r["n_words"] == 0
    assert r["mean_word_len"] == 0.0 and r["alpha_word_ratio"] == 0.0
    assert r["keep"] is False
    assert all(v is not None for v in r.asDict().values())


def test_gopher_stopword_rule(spark):
    no_stop = " ".join(["word"] * (GOPHER_MIN_WORDS + 10))
    out = _gopher(spark, [_doc(1, no_stop)])
    assert out[1]["n_req_stopwords"] == 0 and not out[1]["r_stopwords"]


def _c4(spark, rows):
    return {
        r["doc_id"]: r
        for r in c4_filter_frame(
            spark.createDataFrame(rows, DOC_SCHEMA)
        ).collect()
    }


def test_c4_keeps_terminal_punct_lines_with_enough_words(spark):
    text = "\n".join(
        [
            "this line has five good words.",   # kept
            "too few words here.",               # 4 words -> dropped
            "no terminal punctuation on this line",  # dropped
            'a quoted sentence ending in quotes here."',  # kept
            "another fine sentence with several words!",  # kept
        ]
    )
    r = _c4(spark, [_doc(1, text)])[1]
    assert r["n_lines"] == 5 and r["n_kept_lines"] == 3
    assert r["clean_text"].count("\n") == 2
    assert r["keep"]  # 3 kept lines == C4_MIN_KEPT_LINES


def test_c4_drops_lorem_and_brace_pages(spark):
    base = "\n".join(["a sentence with enough words here."] * C4_MIN_KEPT_LINES)
    lorem = base + "\nLorem Ipsum dolor sit amet."
    brace = base + "\nfunction f() { return 1; }"
    out = _c4(spark, [_doc(1, lorem), _doc(2, brace), _doc(3, base)])
    assert not out[1]["keep"] and not out[2]["keep"] and out[3]["keep"]


def test_c4_too_few_kept_lines_drops_page(spark):
    text = "\n".join(["good sentence with plenty of words."] * (C4_MIN_KEPT_LINES - 1))
    r = _c4(spark, [_doc(1, text)])[1]
    assert r["n_kept_lines"] == C4_MIN_KEPT_LINES - 1 and not r["keep"]


def test_c4_empty_kept_set_gives_empty_clean_text(spark):
    r = _c4(spark, [_doc(1, "no punctuation at all here")])[1]
    assert r["n_kept_lines"] == 0 and r["clean_text"] == "" and not r["keep"]


def test_synth_lines_empty_doc_yields_no_lines(spark):
    # sequence(1, 0) DESCENDS in Spark ([1, 0]); an empty doc must
    # produce empty text, not two fabricated lines (ADVICE r2)
    from paper2llm_spark.operators.webquality import _with_synth_lines

    docs = spark.createDataFrame([_doc(1, ""), _doc(2, "one two three")],
                                 DOC_SCHEMA)
    out = {r["doc_id"]: r["text"] for r in _with_synth_lines(docs).collect()}
    assert out[1] == ""
    assert out[2].rstrip(".") == "one two three"


def test_quality_classifier_matches_pure_python_replay(spark):
    """The Spark logit/keep must equal a hashlib replay of the hashed
    linear model (same md5 bucket, same literal weight table)."""
    import hashlib
    import math

    from paper2llm_spark.operators.webquality import (
        QCLF_BUCKETS,
        QCLF_WEIGHTS,
        quality_classifier_frame,
    )

    def replay(text):
        toks = [t for t in text.lower().split() if t]
        sum_w = sum(
            QCLF_WEIGHTS[
                int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % QCLF_BUCKETS
            ]
            for t in toks
        )
        logit = (
            0.0
            if not toks
            else math.floor(sum_w / 1e6 / len(toks) * 10000 + 0.5) / 10000
        )
        return len(toks), logit, sum_w >= 0

    docs = [
        _doc(1, "the quick brown fox jumps over the lazy dog"),
        _doc(2, "Mixed CASE Tokens  with   runs of spaces"),
        _doc(3, "singleton"),
    ]
    out = {
        r["doc_id"]: r
        for r in quality_classifier_frame(
            spark.createDataFrame(docs, DOC_SCHEMA)
        ).collect()
    }
    for i, (_, text, *_rest) in enumerate(docs, start=0):
        doc_id = docs[i][0]
        n, logit, keep = replay(docs[i][1])
        r = out[doc_id]
        assert (r["n_toks"], r["logit"], r["keep"]) == (n, logit, keep)


def test_quality_classifier_empty_text(spark):
    from paper2llm_spark.operators.webquality import quality_classifier_frame

    r = quality_classifier_frame(
        spark.createDataFrame([_doc(1, "")], DOC_SCHEMA)
    ).collect()[0]
    # empty doc: zero tokens, zero-sum logit, kept (0 >= 0)
    assert r["n_toks"] == 0 and r["logit"] == 0.0 and r["keep"]
