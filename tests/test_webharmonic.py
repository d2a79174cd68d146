"""HyperBall harmonic centrality: register-merge replay on a toy graph,
estimator accuracy vs exact BFS balls, monotone growth — semantics
beyond the driver's hash gate."""

from __future__ import annotations

import hashlib

from paper2llm_spark.operators.webharmonic import (
    HB_EST_NUM,
    HB_M,
    HB_RHO_CAP,
    HB_ROUNDS,
    harmonic_frame,
)


def _reg(i: int) -> tuple[int, int]:
    h = int(hashlib.md5(f"{i}:hb".encode()).hexdigest()[:15], 16)
    w = h // HB_M
    rho = 57 if w == 0 else 57 - w.bit_length()
    return h % HB_M, min(rho, HB_RHO_CAP)


def _est(regs: dict[int, int]) -> int:
    s = sum(1 << (HB_RHO_CAP - r) for r in regs.values())
    s += (HB_M - len(regs)) * (1 << HB_RHO_CAP)
    return HB_EST_NUM // s


def _replay(n: int, edges: list[tuple[int, int]]):
    state = {i: dict([_reg(i)]) for i in range(n)}
    ests = {i: [_est(state[i])] for i in range(n)}
    for _ in range(HB_ROUNDS):
        nxt = {i: dict(state[i]) for i in range(n)}
        for s, d in edges:
            for b, r in state[s].items():
                nxt[d][b] = max(nxt[d].get(b, 0), r)
        state = nxt
        for i in range(n):
            ests[i].append(_est(state[i]))
    return {
        i: (
            ests[i][1:],
            sum((ests[i][r] - ests[i][r - 1]) // r
                for r in range(1, HB_ROUNDS + 1)),
        )
        for i in range(n)
    }


def test_hyperball_hand_replay(spark):
    """Exact replay of register propagation, per-radius estimates and
    the harmonic sum on a 5-node graph."""
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 2)]
    nodes = spark.createDataFrame([(i,) for i in range(5)],
                                  "doc_id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    rows = {r.doc_id: r for r in harmonic_frame(nodes, e).collect()}
    expected = _replay(5, edges)
    for i in range(5):
        balls, harm = expected[i]
        got = [rows[i][f"ball{r}_micro"]
               for r in range(1, HB_ROUNDS + 1)]
        assert got == balls, (i, got, balls)
        assert rows[i].harmonic_micro == harm


def test_estimates_grow_monotonically(spark):
    from paper2llm_spark.operators.webharmonic import harmonic_centrality

    rows = harmonic_centrality(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    for r in rows:
        assert r.ball1_micro <= r.ball2_micro <= r.ball3_micro
        assert r.harmonic_micro >= 0


def test_estimator_tracks_exact_bfs_balls(spark):
    """On the synthetic corpus graph the HLL ball estimate at radius 3
    must track the exact BFS in-ball size: mean relative error of the
    raw m=16 estimator stays within ~3x of its 1.04/sqrt(16) = 26%
    sigma (raw estimator, no small-range correction — bias is expected
    at tiny cardinalities, the mean over 500 nodes is the signal)."""
    from paper2llm_spark.operators.webgraph import PR_OUT_K
    from paper2llm_spark.operators.webharmonic import harmonic_centrality

    n = 500
    edges = set()
    for src in range(n):
        for k in range(PR_OUT_K):
            h = int(hashlib.md5(f"{src}:{k}".encode())
                    .hexdigest()[:15], 16)
            dst = h % n
            if dst != src:
                edges.add((src, dst))
    preds: dict[int, set] = {i: set() for i in range(n)}
    for s, d in edges:
        preds[d].add(s)
    exact = {}
    for v in range(n):
        ball = {v}
        frontier = {v}
        for _ in range(HB_ROUNDS):
            frontier = {u for x in frontier for u in preds[x]} - ball
            ball |= frontier
        exact[v] = len(ball)
    rows = harmonic_centrality(spark, "/root/testdata/sf0.001").collect()
    assert {r.doc_id for r in rows} == set(range(n))  # ids are 0..n-1
    errs = []
    for r in rows:
        est = r.ball3_micro / 1_000_000
        errs.append(abs(est - exact[r.doc_id]) / exact[r.doc_id])
    mean_err = sum(errs) / len(errs)
    assert mean_err < 0.78, mean_err  # 3 x 26% sigma
