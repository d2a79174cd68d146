"""Ranking eval — full Python replay of qrels, MRR and the
literal-gain nDCG, plus the ranker-separation property."""

from __future__ import annotations

import pandas as pd

from paper2llm_spark.operators.webql import ql_topk_frame
from paper2llm_spark.operators.websearch import (
    K, QUERY_EVERY, QUERY_TERMS, bm25_topk_frame,
)
from paper2llm_spark.operators.webrankeval import (
    GAINS, MICRO, REL_MIN_TERMS, rank_eval,
)

SF = "/root/testdata/sf0.001"


def _toks(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


def _qterms(text: str) -> list[str]:
    seen: list[str] = []
    for t in _toks(text):
        if t not in seen:
            seen.append(t)
        if len(seen) == QUERY_TERMS:
            break
    return seen


def test_full_python_replay(spark):
    docs_pd = pd.read_parquet(f"{SF}/documents.parquet")
    text = dict(zip(docs_pd["doc_id"], docs_pd["text"]))
    queries = [d for d in text if d % QUERY_EVERY == 0]
    qrels = {
        q: {d for d, t in text.items()
            if len(set(_qterms(text[q])) & set(_toks(t))) >= REL_MIN_TERMS}
        for q in queries
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lists = {
        "bm25": bm25_topk_frame(docs).collect(),
        "ql": ql_topk_frame(docs).collect(),
    }
    got = {(r.ranker, r.query_id): r for r in rank_eval(spark, SF).collect()}
    assert set(got) == {(m, q) for m in lists for q in queries}
    for method, rows in lists.items():
        by_q: dict[int, list] = {}
        for r in sorted(rows, key=lambda r: (r.query_id, r.rank)):
            by_q.setdefault(r.query_id, []).append(r.doc_id)
        for q, ranked in by_q.items():
            rel = [1 if d in qrels[q] else 0 for d in ranked]
            res = got[(method, q)]
            assert res.n_rel == sum(rel)
            first = next((i + 1 for i, x in enumerate(rel) if x), None)
            assert res.mrr_micro == (MICRO // first if first else 0)
            dcg = sum(x * g for x, g in zip(rel, GAINS))
            r_total = len(qrels[q])
            idcg = sum(GAINS[:min(r_total, K)])
            want = dcg * MICRO // idcg if r_total else 0
            assert res.ndcg_micro == want, (method, q)


def test_table_separates_the_rankers(spark):
    rows = rank_eval(spark, SF).collect()
    mean = {}
    for m in ("bm25", "ql"):
        xs = [r.ndcg_micro for r in rows if r.ranker == m]
        mean[m] = sum(xs) / len(xs)
    # on the 31-term fixture vocabulary BM25's negative-idf quirk
    # pushes 2-term matchers out of its top-10 while QL's length
    # prior keeps them — the eval table honestly separates the two
    assert mean["ql"] > mean["bm25"]
