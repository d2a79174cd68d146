"""Salted-hash split assignment — determinism, proportions,
bucket/split consistency."""

from __future__ import annotations

from paper2llm_spark.operators.websplit import (
    TRAIN_PER_MILLE, VAL_PER_MILLE, split_assign,
)


def test_split_consistent_and_proportional(spark):
    rows = split_assign(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 500
    for r in rows:
        assert 0 <= r.bucket < 1000
        want = ("train" if r.bucket < TRAIN_PER_MILLE
                else "val" if r.bucket < VAL_PER_MILLE else "test")
        assert r.split == want
    shares = {s: sum(1 for r in rows if r.split == s) / len(rows)
              for s in ("train", "val", "test")}
    assert 0.85 < shares["train"] < 0.95
    assert shares["val"] > 0 and shares["test"] > 0


def test_split_membership_independent_of_other_docs(spark):
    # the split of a doc depends only on its id: recomputing over a
    # filtered corpus yields identical assignments (the leakage-free
    # property that motivates hash splits)
    full = {r.doc_id: r.split
            for r in split_assign(spark, "/root/testdata/sf0.01").collect()}
    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).filter("doc_id % 3 = 0")
    from paper2llm_spark.operators.websplit import split_frame
    sub = {r.doc_id: r.split for r in split_frame(docs).collect()}
    assert sub == {k: v for k, v in full.items() if k % 3 == 0}
