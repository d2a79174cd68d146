"""Query-biased snippets — Python replay of the window fold over the
ranker's own output pairs, plus leftmost-tie hand corpus."""

from __future__ import annotations

import pandas as pd

from paper2llm_spark.operators.websearch import QUERY_EVERY, QUERY_TERMS
from paper2llm_spark.operators.websnippet import SNIP_W, snippets, snippets_frame

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


def _best_window(tok: list[str], q: set[str]) -> tuple[int, int, str]:
    h = [1 if t in q else 0 for t in tok]
    n = len(tok)
    sums = [sum(h[i:i + SNIP_W]) for i in range(max(n - SNIP_W + 1, 1))]
    best = max(sums)
    start = sums.index(best)  # leftmost
    return start + 1, best, " ".join(tok[start:start + SNIP_W])


def test_fixture_python_window_replay(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    text = dict(zip(docs["doc_id"], docs["text"]))
    rows = snippets(spark, SF).collect()
    assert rows
    for r in rows:
        q = set(_qterms(text[r.query_id]))
        start, hits, snip = _best_window(_toks(text[r.doc_id]), q)
        assert (r.start, r.n_hits, r.snippet) == (start, hits, snip), r
        assert r.n_hits >= 1
        assert len(r.snippet.split()) <= SNIP_W


def test_leftmost_tie_and_short_doc(spark):
    # doc 0 seeds the query (terms qa qb qc); doc 1 has two windows
    # with 2 hits — the leftmost must win; doc 2 is shorter than the
    # window (single whole-doc window)
    filler = " ".join(["z"] * (SNIP_W - 2))
    rows = [
        (0, f"qa qb qc {' '.join(['pad'] * 60)}"),
        (1, f"qa qb {filler} {filler} qa qc {filler}"),
        (2, "qa qb"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in snippets_frame(docs).collect()}
    if 1 in got:
        r = got[1]
        assert r.n_hits == 2 and r.start == 1
        assert r.snippet.startswith("qa qb")
    if 2 in got:
        assert got[2].start == 1 and got[2].n_hits == 2
        assert got[2].snippet == "qa qb"
    assert got  # the ranker picked at least one of the planted docs
