"""PQ distortion audit — Python encode replay against the frozen
codebooks and audit-table invariants."""

from __future__ import annotations

import hashlib

import pandas as pd

from paper2llm_spark.operators.similarity import (
    M_SUB, N_CODES, PQ_CODEBOOKS, SUB_DIM,
)
from paper2llm_spark.operators.webpqdist import MICRO, pq_distortion

SF = "/root/testdata/sf0.001"


def _sq_l2(a, b):
    return (sum(x * x for x in a) - 2 * sum(x * y for x, y in zip(a, b))
            + sum(y * y for y in b))


def test_full_python_encode_replay(spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    tot = [0] * M_SUB
    mx = [0] * M_SUB
    used = [set() for _ in range(M_SUB)]
    for vec in emb["embedding"]:
        v = [float(x) for x in vec]
        for m in range(M_SUB):
            s = v[m * SUB_DIM:(m + 1) * SUB_DIM]
            dists = [round(_sq_l2(s, c), 6) for c in PQ_CODEBOOKS[m]]
            err = min(dists)
            used[m].add(dists.index(err))
            e = int(err * MICRO + 0.5)  # floor(x + .5) for x >= 0
            tot[m] += e
            mx[m] = max(mx[m], e)
    rows = {r.subspace: r for r in pq_distortion(spark, SF).collect()}
    assert set(rows) == set(range(M_SUB))
    n = len(emb)
    for m in range(M_SUB):
        r = rows[m]
        assert r.n_vecs == n
        assert r.total_err_micro == tot[m], m
        assert r.max_err_micro == mx[m]
        assert r.mean_err_micro == tot[m] // n
        assert r.codes_used == len(used[m])
        assert 1 <= r.codes_used <= N_CODES
