"""TrustRank + spam mass: hand-replayed propagation on a toy graph,
seed bias, mass polarity — semantics beyond the driver's hash gate."""

from __future__ import annotations

from paper2llm_spark.operators.webgraph import (
    PR_BASE, PR_DAMP_DEN, PR_DAMP_NUM, PR_INIT, PR_ITERS,
)
from paper2llm_spark.operators.webtrust import MICRO, trustrank_frame


def _toy(spark, edges):
    nodes = spark.createDataFrame(
        [(i,) for i in range(4)], "doc_id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    return {r.doc_id: r for r in trustrank_frame(nodes, e).collect()}


def _replay(edges, n, seeds):
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    pr = {i: PR_INIT for i in range(n)}
    tr = {i: PR_INIT * (i in seeds) for i in range(n)}
    for vec, base in ((pr, {i: PR_BASE for i in range(n)}),
                      (tr, {i: PR_BASE * (i in seeds) for i in range(n)})):
        for _ in range(PR_ITERS):
            sums = {i: 0 for i in range(n)}
            for s, d in edges:
                sums[d] += vec[s] // deg[s]
            for i in range(n):
                vec[i] = base[i] + (PR_DAMP_NUM * sums[i]) // PR_DAMP_DEN
    return pr, tr


def test_trustrank_hand_replay(spark):
    """Exact replay of both vectors + scaling + mass on a 4-node path
    graph.  doc_ids 0..3: the hash-rolled seed oracle is replayed with
    the same md5 hash."""
    import hashlib

    seeds = {
        i for i in range(4)
        if int(hashlib.md5(f"{i}:seed".encode()).hexdigest()[:15], 16)
        % 7 == 0
    }
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    rows = _toy(spark, edges)
    pr, tr = _replay(edges, 4, seeds)
    total_pr, total_tr = sum(pr.values()), sum(tr.values())
    for i in range(4):
        r = rows[i]
        assert r.is_seed == int(i in seeds)
        assert r.rank_micro == pr[i]
        scaled = (tr[i] * total_pr) // max(1, total_tr)
        assert r.trust_scaled_micro == scaled
        assert r.spam_mass_micro == (
            MICRO * (pr[i] - min(pr[i], scaled))) // max(1, pr[i])


def test_spam_mass_polarity(spark):
    """A node fed only by seeds has (near-)zero spam mass; a node in a
    seedless clique keeps rank but collects no trust -> mass -> 1e6."""
    import hashlib

    # choose ids so 7 is NOT a seed and 0.. are checked dynamically
    seeds = [
        i for i in range(100)
        if int(hashlib.md5(f"{i}:seed".encode()).hexdigest()[:15], 16)
        % 7 == 0
    ]
    seed, nonseed = seeds[0], next(
        i for i in range(100) if i not in seeds)
    other = next(i for i in range(100)
                 if i not in seeds and i != nonseed)
    nodes = spark.createDataFrame(
        [(seed,), (nonseed,), (other,)], "doc_id long")
    # seed -> nonseed (trust flows); other is isolated (rank base only,
    # zero trust: pure spam mass)
    e = spark.createDataFrame(
        [(seed, nonseed)], "src long, dst long")
    rows = {r.doc_id: r for r in trustrank_frame(nodes, e).collect()}
    assert rows[other].trust_scaled_micro == 0
    assert rows[other].spam_mass_micro == MICRO
    assert rows[nonseed].spam_mass_micro < MICRO


def test_corpus_polarities(spark):
    from paper2llm_spark.operators.webtrust import trustrank

    rows = trustrank(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    assert {r.is_seed for r in rows} == {0, 1}
    masses = [r.spam_mass_micro for r in rows]
    assert min(masses) < 100_000 and max(masses) > 500_000
