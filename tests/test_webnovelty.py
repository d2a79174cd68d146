"""Shingle novelty — semantics beyond the driver's hash gate:
first-appearance attribution on handcrafted snapshot corpora."""

from __future__ import annotations

from paper2llm_spark.operators.webnovelty import (
    shingle_novelty, shingle_novelty_frame,
)

SF = "/root/testdata/sf0.001"


def _novelty(spark, rows: list[tuple[int, str, int]]):
    df = spark.createDataFrame(rows, "doc_id long, text string, snap long")
    return {
        r.snap: r for r in shingle_novelty_frame(df).collect()
    }


def test_repeat_across_snapshots_not_novel(spark):
    text = "alpha beta gamma delta"  # 2 trigram shingles
    out = _novelty(spark, [(1, text, 0), (2, text, 1)])
    assert out[0].n_instances == 2 and out[0].novelty_permille == 1000
    assert out[1].n_instances == 2 and out[1].n_novel == 0
    assert out[1].novelty_permille == 0


def test_fresh_content_fully_novel(spark):
    out = _novelty(spark, [
        (1, "alpha beta gamma", 0),
        (2, "epsilon zeta eta", 1),  # shares nothing with snap 0
    ])
    assert out[1].novelty_permille == 1000


def test_within_snapshot_ties_all_novel(spark):
    # two docs in the SAME snapshot sharing a shingle: both instances
    # are first appearances (first appearance, not first document)
    out = _novelty(spark, [
        (1, "alpha beta gamma", 0),
        (2, "alpha beta gamma", 0),
    ])
    assert out[0].n_instances == 2 and out[0].n_novel == 2


def test_within_doc_duplicates_collapse(spark):
    # the same shingle repeated inside ONE doc is a single instance
    out = _novelty(spark, [(1, "a b c a b c a b c", 0)])
    # tokens: a b c a b c a b c -> distinct shingles: 'a b c','b c a','c a b'
    assert out[0].n_instances == 3


def test_corpus_novelty_decays(spark):
    rows = {r.snap: r for r in shingle_novelty(spark, SF).collect()}
    assert rows[0].novelty_permille == 1000  # earliest snap all-novel
    # planted duplicates repeat across snapshots -> later snaps lose novelty
    assert rows[1].novelty_permille < 1000
    assert rows[2].novelty_permille < 1000
    for r in rows.values():
        assert 0 <= r.n_novel <= r.n_instances
