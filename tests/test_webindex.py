"""Postings builder — semantics beyond the driver's hash gate:
gap-decode round trip, tf correctness, stop-term cap."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _index(spark, docs):
    from paper2llm_spark.operators.webindex import index_postings_frame

    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["term"]: (r["df"], r["gaps"], r["tfs"])
        for r in index_postings_frame(df).collect()
    }


def test_postings_and_gap_encoding(spark):
    got = _index(spark, [
        (3, "apple banana apple"),
        (7, "banana cherry"),
        (12, "apple apple apple cherry"),
    ])
    # apple: docs 3 (tf 2), 12 (tf 3) -> gaps 3, 9
    assert got["apple"] == (2, "3,9", "2,3")
    assert got["banana"] == (2, "3,4", "1,1")
    assert got["cherry"] == (2, "7,5", "1,1")


def test_gap_decode_recovers_tf_table(spark):
    """Decoding gaps must reproduce exactly the per-(term, doc) tf
    counts of a direct computation."""
    docs = [(i, f"w{i % 7} w{i % 5} w{i % 7} shared") for i in range(40)]
    got = _index(spark, docs)
    decoded = {}
    for term, (df, gaps, tfs) in got.items():
        pos = 0
        gs = [int(x) for x in gaps.split(",")]
        ts = [int(x) for x in tfs.split(",")]
        assert df == len(gs) == len(ts)
        for g, t in zip(gs, ts):
            pos += g
            decoded[(term, pos)] = t
    want = {}
    for d, text in docs:
        for tok in text.split():
            want[(tok, d)] = want.get((tok, d), 0) + 1
    # apply the operator's stop-term cap (df > 80% of corpus dropped):
    # "shared" sits in all 40 docs
    dfs = {}
    for (tok, _d) in want:
        dfs[tok] = dfs.get(tok, 0) + 1
    want = {k: v for k, v in want.items() if 100 * dfs[k[0]] <= 80 * 40}
    assert decoded == want


def test_stop_term_cap_drops_hot_terms(spark):
    """A term in >80% of documents is a stop term: dropped before any
    posting buffer forms; rarer terms keep full postings."""
    docs = [(i, f"stopword unique{i}") for i in range(50)]
    docs += [(50 + i, f"midword filler{i}") for i in range(20)]
    got = _index(spark, docs)
    assert "stopword" in got            # 50/70 = 71% <= 80% -> kept
    docs = [(i, f"stopword unique{i}") for i in range(60)]
    docs += [(60 + i, f"midword filler{i}") for i in range(10)]
    got = _index(spark, docs)
    assert "stopword" not in got        # 60/70 = 86% > 80% -> dropped
    assert "midword" in got and got["midword"][0] == 10
    assert sum(1 for t in got if t.startswith("unique")) == 60


def test_corpus_index_consistency(spark):
    """31-term synthetic vocabulary: the fractional cap keeps the gate
    discriminating (some terms dropped, most kept), and every row's
    gap/tf strings decode to exactly df entries."""
    from paper2llm_spark.operators.webindex import index_postings

    out = index_postings(spark, SF).cache()
    try:
        n = out.count()
        assert 10 <= n < 31, n          # split, not vacuous
        bad = out.filter(
            (F.size(F.split("gaps", ",")) != F.col("df"))
            | (F.size(F.split("tfs", ",")) != F.col("df"))
        ).count()
        assert bad == 0
        assert out.agg(F.max("df")).collect()[0][0] <= 400  # 80% of 500
    finally:
        out.unpersist()
