"""Seed-distance BFS — hand chain with unreached tail, fixture
invariants."""

from __future__ import annotations

from paper2llm_spark.operators.webseed import (
    BFS_ROUNDS, seed_distance, seed_distance_frame,
)


def test_chain_distances_and_unreached_tail(spark):
    # chain 0-1-2-3-4-5, seed = node 0 (0 % 53 == 0): after 3 rounds
    # hops 0..3 are labeled, nodes 4 and 5 report the -1 sentinel
    assert BFS_ROUNDS == 3
    nodes = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    arcs = [(i, i + 1) for i in range(5)]
    adj = spark.createDataFrame(
        arcs + [(b, a) for a, b in arcs], "u long, v long"
    )
    got = {r.doc_id: (r.is_seed, r.hop_dist)
           for r in seed_distance_frame(nodes, adj).collect()}
    assert got == {0: (True, 0), 1: (False, 1), 2: (False, 2),
                   3: (False, 3), 4: (False, -1), 5: (False, -1)}


def test_fixture_distances_consistent(spark):
    rows = seed_distance(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    seeds = [r for r in rows if r.is_seed]
    assert seeds and all(r.hop_dist == 0 for r in seeds)
    assert all(-1 <= r.hop_dist <= BFS_ROUNDS for r in rows)
    assert any(r.hop_dist >= 1 for r in rows)
