"""Dirichlet QL retrieval + RRF fusion — formula re-derivation and
fusion consistency against the two input rankers."""

from __future__ import annotations

import math

from paper2llm_spark.operators.webql import (
    MU, RRF_K, K, bm25_topk_frame, ql_topk_frame, rrf_frame,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ql_matches_formula_rederivation(spark):
    # query doc 0 -> terms a, b, c; candidates are docs sharing a term
    rows = [(0, "a b c"), (1, "a a a x"), (2, "z z")]
    docs = _docs(spark, rows)
    got = {(r.query_id, r.doc_id): (r.rank, r.score_micro)
           for r in ql_topk_frame(docs).collect()}
    assert set(got) == {(0, 0), (0, 1)}        # doc 2 never matches

    toks = {0: ["a", "b", "c"], 1: ["a", "a", "a", "x"], 2: ["z", "z"]}
    t_tokens = sum(len(v) for v in toks.values())
    cf = {"a": 4, "b": 1, "c": 1}

    def score(doc):
        dl = len(toks[doc])
        s = 0
        for term in ("a", "b", "c"):
            tf = toks[doc].count(term)
            s += math.floor(
                math.log((tf * t_tokens + MU * cf[term])
                         / (t_tokens * (dl + MU))) * 1e6 + 0.5
            )
        return s

    assert got[(0, 0)][1] == score(0)
    assert got[(0, 1)][1] == score(1)
    # doc 0 holds all three query terms -> it outranks doc 1
    assert got[(0, 0)][0] == 1 and got[(0, 1)][0] == 2


def test_rrf_consistent_with_input_rankers(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    bm25 = {(r.query_id, r.doc_id): r.rank
            for r in bm25_topk_frame(docs).collect()}
    ql = {(r.query_id, r.doc_id): r.rank
          for r in ql_topk_frame(docs).collect()}
    fused = rrf_frame(docs).collect()
    assert fused
    for r in fused:
        key = (r.query_id, r.doc_id)
        want, lists = 0, 0
        for tbl in (bm25, ql):
            if key in tbl:
                want += 1_000_000 // (RRF_K + tbl[key])
                lists += 1
        assert (r.rrf_micro, r.n_lists) == (want, lists), key
        assert 1 <= r.rank <= K
    # NOTE: on the fixture corpus the two top-10s are DISJOINT — the
    # 31-term vocabulary makes every query term common, so QL's
    # Dirichlet length prior dominates while BM25's tf/dl shape picks
    # different docs; correct behavior, and why the n_lists == 2
    # branch is certified on the hand corpus below instead
    assert {r.n_lists for r in fused} == {1}


def test_rrf_merges_when_rankers_agree(spark):
    # fewer candidates than K: every candidate sits on BOTH top-10
    # lists, so fusion doubles their rrf mass and n_lists == 2
    rows = [(0, "a b c"), (1, "a b c a b c"), (2, "x y"),
            (3, "a q q q")]
    docs = _docs(spark, rows)
    fused = rrf_frame(docs).collect()
    assert fused and all(r.n_lists == 2 for r in fused)
    got = {r.doc_id: r.rrf_micro for r in fused if r.query_id == 0}
    bm25 = {(r.query_id, r.doc_id): r.rank
            for r in bm25_topk_frame(docs).collect()}
    ql = {(r.query_id, r.doc_id): r.rank
          for r in ql_topk_frame(docs).collect()}
    for d, v in got.items():
        assert v == 1_000_000 // (RRF_K + bm25[(0, d)]) \
            + 1_000_000 // (RRF_K + ql[(0, d)])
