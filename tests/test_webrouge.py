"""ROUGE audit — full Python replay against the summarizer's own
choices and polarity checks."""

from __future__ import annotations

import re

import pandas as pd

from paper2llm_spark.operators.webrouge import CHUNK_W, MICRO, rouge_audit

SF = "/root/testdata/sf0.001"


def _sents(text: str) -> list[str]:
    marked = re.sub(r"([.!?]) ", "\\1\x01", text)
    return [s.strip() for s in marked.split("\x01") if s.strip()]


def _toks(s: str) -> list[str]:
    return [t for t in s.lower().split() if t]


def _grams(s: str, n: int) -> set:
    t = _toks(s)
    if n == 1:
        return set(t)
    return {" ".join(t[i:i + 2]) for i in range(len(t) - 1)}


def test_full_python_replay(spark):
    df = pd.read_parquet(f"{SF}/documents.parquet")
    text = dict(zip(df["doc_id"], df["text"]))
    rows = rouge_audit(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.best_sent >= 0
        toks = [t for t in text[r.doc_id].lower().split() if t]
        chunked = ". ".join(
            " ".join(toks[i:i + CHUNK_W])
            for i in range(0, len(toks), CHUNK_W)
        ) + "."
        sents = _sents(chunked)
        sys, ref = sents[r.best_sent], sents[0]
        for n, got in ((1, r.rouge1_micro), (2, r.rouge2_micro)):
            s, t = _grams(sys, n), _grams(ref, n)
            want = len(s & t) * MICRO // max(len(t), 1)
            assert got == want, (r.doc_id, n)
        assert r.lead_is_best == (r.best_sent == 0)
    # both polarities: some docs beat the lead, and non-lead picks
    # score strictly below perfect recall somewhere
    assert any(r.lead_is_best for r in rows)
    assert any(not r.lead_is_best for r in rows)
    assert any(r.rouge1_micro < MICRO for r in rows)
