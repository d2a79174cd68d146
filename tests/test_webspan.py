"""Span-corruption planning — full Python replay of the hash-driven
mask and profile-rate sanity."""

from __future__ import annotations

import hashlib

import pandas as pd

from paper2llm_spark.operators.webspan import (
    MAX_L, MICRO, SPAN_MIN, SPAN_RNG, START_MOD, span_corruption,
)

SF = "/root/testdata/sf0.001"


def _h(doc_id: int, i: int, tag: str) -> int:
    return int(
        hashlib.md5(f"{doc_id}:{i}:{tag}".encode()).hexdigest()[:15], 16
    )


def _plan(doc_id: int, n: int) -> tuple[int, int, int]:
    ls = [
        SPAN_MIN + _h(doc_id, i, "sl") % SPAN_RNG
        if _h(doc_id, i, "sc") % START_MOD == 0 else 0
        for i in range(1, n + 1)
    ]
    mask = [
        1 if any(
            ls[s - 1] >= j - s + 1
            for s in range(max(j - MAX_L + 1, 1), j + 1)
        ) else 0
        for j in range(1, n + 1)
    ]
    sent = sum(
        1 for j in range(n)
        if mask[j] == 1 and (j == 0 or mask[j - 1] == 0)
    )
    return sum(1 for x in ls if x), sum(mask), sent


def test_full_python_replay(spark):
    df = pd.read_parquet(f"{SF}/documents.parquet")
    n_toks = {
        int(d): len([t for t in t_.lower().split() if t])
        for d, t_ in zip(df["doc_id"], df["text"])
    }
    rows = {r.doc_id: r for r in span_corruption(spark, SF).collect()}
    assert set(rows) == set(n_toks)
    total_masked = total_tokens = 0
    for d, n in n_toks.items():
        r = rows[d]
        assert r.n_tokens == n
        starts, masked, sent = _plan(d, n)
        assert (r.n_starts, r.n_masked, r.n_sentinels) == (
            starts, masked, sent), d
        assert r.mask_rate_micro == masked * MICRO // max(n, 1)
        assert r.n_masked <= r.n_tokens
        assert r.n_sentinels <= max(r.n_starts, 0 if n else 0)
        total_masked += masked
        total_tokens += n
    # the realized corpus rate sits near the nominal 5% x 3 = 15%
    rate = total_masked / total_tokens
    assert 0.08 < rate < 0.25, rate
