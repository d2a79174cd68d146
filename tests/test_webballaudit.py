"""HyperBall audit — exact balls replayed in Python, estimate columns
tied to the registered query, and the raw-estimator bias made
visible."""

from __future__ import annotations

import hashlib

import pandas as pd

from paper2llm_spark.operators.webgraph import PR_OUT_K
from paper2llm_spark.operators.webballaudit import MICRO, ball_audit
from paper2llm_spark.operators.webharmonic import harmonic_centrality

SF = "/root/testdata/sf0.001"


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _exact_balls(n: int) -> tuple[dict, dict]:
    edges = set()
    for src in range(n):
        for k in range(PR_OUT_K):
            dst = _h(f"{src}:{k}") % n
            if dst != src:
                edges.add((src, dst))
    into: dict[int, set] = {v: {v} for v in range(n)}
    for s, d in edges:
        into[d].add(s)
    b1 = {v: set(m) for v, m in into.items()}
    b2 = {v: set(m) for v, m in b1.items()}
    for s, d in edges:
        b2[d] |= b1[s]
    return ({v: len(m) for v, m in b1.items()},
            {v: len(m) for v, m in b2.items()})


def test_exact_balls_and_estimator_bias(spark):
    n = len(pd.read_parquet(f"{SF}/documents.parquet"))
    e1, e2 = _exact_balls(n)
    est = {r.doc_id: r for r in harmonic_centrality(spark, SF).collect()}
    rows = {r.doc_id: r for r in ball_audit(spark, SF).collect()}
    assert set(rows) == set(range(n))
    for v, r in rows.items():
        assert (r.exact1, r.exact2) == (e1[v], e2[v]), v
        # the estimate columns ARE the registered query's balls
        assert r.est1_micro == est[v].ball1_micro
        assert r.est2_micro == est[v].ball2_micro
        assert r.exact2 >= r.exact1 and r.est2_micro >= r.est1_micro
        assert r.err1_micro == abs(r.est1_micro - r.exact1 * MICRO) \
            // r.exact1
    # the documented raw-estimator (no linear-counting) bias on small
    # balls is visible: median relative error at r=1 is large
    errs = sorted(r.err1_micro for r in rows.values())
    assert errs[len(errs) // 2] > MICRO  # > 100% on tiny exact balls
