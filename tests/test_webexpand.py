"""PRF query expansion — full Python replay over the ranker's own
top-k and structural constraints."""

from __future__ import annotations

import math

import pandas as pd

from paper2llm_spark.operators.websearch import bm25_topk_frame
from paper2llm_spark.operators.webexpand import (
    EXPAND_K, MICRO, query_expansion,
)
from paper2llm_spark.operators.webql import QUERY_EVERY, QUERY_TERMS

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
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    text = dict(zip(docs["doc_id"], docs["text"]))
    n = len(docs)
    df_tbl: dict[str, int] = {}
    for t in text.values():
        for term in set(_toks(t)):
            df_tbl[term] = df_tbl.get(term, 0) + 1
    topk: dict[int, list] = {}
    for r in bm25_topk_frame(
        spark.read.parquet(f"{SF}/documents.parquet")
    ).collect():
        topk.setdefault(r.query_id, []).append(r.doc_id)

    want: dict[int, list] = {}
    for q, doc_ids in topk.items():
        qset = set(_qterms(text[q]))
        tf: dict[str, int] = {}
        for d in doc_ids:
            for term in _toks(text[d]):
                tf[term] = tf.get(term, 0) + 1
        scored = []
        for term, f in tf.items():
            if term in qset:
                continue
            idf = math.floor(
                math.log((n + 1) / (df_tbl[term] + 1)) * MICRO + 0.5
            )
            scored.append((f * idf, term, f))
        scored.sort(key=lambda x: (-x[0], x[1]))
        want[q] = scored[:EXPAND_K]

    rows = query_expansion(spark, SF).collect()
    got: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.query_id, r.rank)):
        got.setdefault(r.query_id, []).append(
            (r.score_micro, r.term, r.tf_total)
        )
        assert r.term not in set(_qterms(text[r.query_id]))
        assert 1 <= r.rank <= EXPAND_K
    assert got == want
