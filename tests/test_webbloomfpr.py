"""Bloom FPR audit — full Python replay of the bit synthesis and the
fill-law consistency bound."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from paper2llm_spark.operators.webbloomfpr import MICRO, bloom_fpr
from paper2llm_spark.operators.webfilter import BLOOM_BITS, BLOOM_K

SF = "/root/testdata/sf0.001"


def _bits(dg: str) -> set:
    return {
        int(hashlib.md5(f"{dg}:{i}".encode()).hexdigest()[:15], 16)
        % BLOOM_BITS
        for i in range(BLOOM_K)
    }


def test_full_python_replay_and_fill_law(spark):
    df = pd.read_parquet(f"{SF}/documents.parquet")
    dg = {int(d): hashlib.md5(t.encode()).hexdigest()
          for d, t in zip(df["doc_id"], df["text"])}
    seen = {d: g for d, g in dg.items() if d % 2 == 0}
    seen_digests = set(seen.values())
    filt: set = set()
    for g in seen.values():
        filt |= _bits(g)
    n_neg = n_fp = 0
    for d, g in dg.items():
        if g in seen_digests:
            continue
        n_neg += 1
        if _bits(g) <= filt:
            n_fp += 1
    r = bloom_fpr(spark, SF).collect()[0]
    assert (r.m, r.k) == (BLOOM_BITS, BLOOM_K)
    assert r.n_seen == len(seen_digests)
    assert r.bits_set == len(filt)
    assert r.fill_micro == len(filt) * MICRO // BLOOM_BITS
    assert (r.n_neg, r.n_fp) == (n_neg, n_fp)
    assert r.fpr_micro == n_fp * MICRO // max(n_neg, 1)
    f = r.fill_micro
    assert r.theory_micro == f * f * f // 10**12
    # empirical rate consistent with the fill law: within 4 binomial
    # sigma of the exact (bits_set/m)^k expectation
    p = (len(filt) / BLOOM_BITS) ** BLOOM_K
    sigma = math.sqrt(max(p * (1 - p) / max(n_neg, 1), 1e-18))
    assert abs(n_fp / max(n_neg, 1) - p) <= 4 * sigma + 1e-9
