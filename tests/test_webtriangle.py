"""Triangle counting — hand graph (triangle + square) and fixture
invariants."""

from __future__ import annotations

from paper2llm_spark.operators.webtriangle import (
    triangle_counts, triangle_frame,
)


def test_triangle_vs_square_hand_graph(spark):
    # triangle {0,1,2} closes; square {3,4,5,6} has no triangle;
    # node 7 isolated
    nodes = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    arcs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (5, 6), (3, 6)]
    adj = spark.createDataFrame(
        arcs + [(b, a) for a, b in arcs], "u long, v long"
    )
    got = {r.doc_id: (r.deg, r.n_tri, r.cc_micro)
           for r in triangle_frame(nodes, adj).collect()}
    for i in (0, 1, 2):
        assert got[i] == (2, 1, 1_000_000)   # fully closed pair
    for i in (3, 4, 5, 6):
        assert got[i] == (2, 0, 0)
    assert got[7] == (0, 0, 0)


def test_fixture_counts_consistent(spark):
    rows = triangle_counts(spark, "/root/testdata/sf0.001").collect()
    total = sum(r.n_tri for r in rows)
    assert total > 0 and total % 3 == 0       # each triangle counted 3x
    for r in rows:
        assert 0 <= r.cc_micro <= 1_000_000
        if r.deg < 2:
            assert r.n_tri == 0 and r.cc_micro == 0
