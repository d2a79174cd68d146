"""Dedup chaining audit — replay from the two composed stages and
the strictness-gap polarity."""

from __future__ import annotations

from paper2llm_spark.operators.dedup import (
    lsh_duplicate_clusters, lsh_verified_pairs,
)
from paper2llm_spark.operators.webchain import chain_audit

SF = "/root/testdata/sf0.001"


def test_replay_from_cluster_and_verified_stages(spark):
    members: dict[int, list] = {}
    for r in lsh_duplicate_clusters(spark, SF).collect():
        members.setdefault(r.cluster, []).append(r.doc_id)
    verified = {(r.doc_a, r.doc_b): r.est_jaccard
                for r in lsh_verified_pairs(spark, SF).collect()}
    rows = {r.cluster: r for r in chain_audit(spark, SF).collect()}
    multi = {c: sorted(m) for c, m in members.items() if len(m) >= 2}
    assert set(rows) == set(multi)
    for c, ms in multi.items():
        pairs = [(a, b) for i, a in enumerate(ms) for b in ms[i + 1:]]
        vs = [verified[p] for p in pairs if p in verified]
        r = rows[c]
        assert r.size == len(ms)
        assert r.n_possible == len(pairs)
        assert r.n_verified == len(vs)
        assert r.chained == (len(vs) < len(pairs))
        want_min = min(vs) if vs else 0.0
        assert abs(r.min_est4 - want_min) < 1e-9
    # the strictness gap is real on the fixture: some clusters rely on
    # transitivity (candidate pairs that verification rejected), most
    # are fully pairwise-verified
    flags = [r.chained for r in rows.values()]
    assert any(flags) and not all(flags)
