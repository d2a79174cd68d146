"""Broder containment — the asymmetric-duplicate semantics the
resemblance (Jaccard) family misses: a doc embedded in a bigger doc
pairs at containment 1.0 with low Jaccard."""

from __future__ import annotations

from paper2llm_spark.operators.webcontain import (
    containment_pairs, containment_pairs_frame, synth_aggregator_docs,
)

SF = "/root/testdata/sf0.001"


def _words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_subset_pair_full_containment_low_jaccard(spark):
    inner = _words("w", 30)
    rows = [
        (1, inner),
        (2, inner + " " + _words("fill", 120)),
        (3, _words("other", 40)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.doc_a, r.doc_b): r
           for r in containment_pairs_frame(df).collect()}
    assert (1, 2) in out
    r = out[(1, 2)]
    # every trigram of doc 1 (28 of them) lives in doc 2
    assert r.shared == r.n_a == 28
    assert r.containment_micro == 1_000_000
    assert r.jaccard_micro < 500_000  # resemblance dedup would miss it
    assert (1, 3) not in out and (2, 3) not in out


def test_hot_shingles_capped_before_join(spark):
    # one shingle shared by 20 docs (df > DF_CAP=16): no pairs from it
    rows = [(i, "the same hot shingle here") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert containment_pairs_frame(df).count() == 0


def test_corpus_plants_aggregator_twins(spark):
    out = containment_pairs(spark, SF).collect()
    twins = [r for r in out if r.doc_b == r.doc_a + 1_000_000]
    assert twins, "planted aggregator twins must surface"
    assert all(r.containment_micro >= 900_000 for r in out)
    # the twin adds ~120 filler tokens: Jaccard strictly below containment
    assert all(r.jaccard_micro < r.containment_micro for r in twins)
