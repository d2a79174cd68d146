"""Synchronous label propagation — hand-rolled rounds and the
block-disconnection certificate."""

from __future__ import annotations

from pyspark.sql import functions as F

from paper2llm_spark.operators.weblpa import lpa_communities, lpa_frame


def test_lpa_hand_rolled_three_rounds(spark):
    # triangle {0,1,2} + isolated 3 + pair {4,5}
    nodes = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    arcs = [(0, 1), (0, 2), (1, 2), (4, 5)]
    adj = spark.createDataFrame(
        arcs + [(b, a) for a, b in arcs], "u long, v long"
    )
    got = {r.doc_id: r.community for r in lpa_frame(nodes, adj).collect()}
    # r1: 0<-min(1,2)=1, 1<-0, 2<-0, 3 keeps 3, 4<->5 swap
    # r2: 0<-0, 1<-tie(1,0)->0, 2<-tie(1,0)->0, 4<->5 swap back
    # r3: triangle converged to 0; the 2-cycle oscillates (the paper's
    # own synchronous-update caveat, frozen by the fixed round cap)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 5, 5: 4}


def test_lpa_blocks_never_leak(spark):
    # planted residue-class blocks are disconnected: a node's final
    # community must sit in its own block
    rows = lpa_communities(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    assert all(r.community % 4 == r.doc_id % 4 for r in rows)
    # propagation actually happened: most nodes no longer self-label
    moved = sum(1 for r in rows if r.community != r.doc_id)
    assert moved > 250
