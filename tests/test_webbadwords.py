"""C4 badwords gate — token-boundary matching (never substring),
occurrence vs distinct counts, and the keep verdict."""

from __future__ import annotations

from paper2llm_spark.operators.webbadwords import badwords_frame


def _rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r.doc_id: (r.n_bad, r.n_distinct_bad, r.keep)
        for r in badwords_frame(df).collect()
    }


def test_token_boundary_not_substring(spark):
    # "blockterms" contains the list word "blockterm" as a substring but
    # is a different TOKEN -> clean (C4 matched words, not substrings)
    got = _rows(spark, ["blockterms are fine", "a blockterm here"])
    assert got[0] == (0, 0, True)
    assert got[1] == (1, 1, False)


def test_occurrences_vs_distinct(spark):
    got = _rows(spark, ["blockterm blockterm unsafeword"])
    assert got[0] == (3, 2, False)


def test_case_folded_matching(spark):
    got = _rows(spark, ["BLOCKTERM shouts"])
    assert got[0] == (1, 1, False)
