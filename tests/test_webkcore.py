"""k-core peeling — hand-built clique with a pendant cascade."""

from __future__ import annotations

from itertools import combinations

from paper2llm_spark.operators.webkcore import (
    K_CORE, kcore_frame, kcore_membership,
)


def test_clique_survives_pendant_cascade_peels(spark):
    assert K_CORE == 5
    # 6-clique {0..5} (degree 5 each) + pendant chain 0-6-7:
    # wave 1 peels 7 (deg 1) and 6 (deg 2); node 0's degree drops
    # back to exactly 5 and the clique stands
    nodes = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    arcs = list(combinations(range(6), 2)) + [(0, 6), (6, 7)]
    adj = spark.createDataFrame(
        arcs + [(b, a) for a, b in arcs], "u long, v long"
    )
    got = {r.doc_id: (r.in_core, r.core_deg)
           for r in kcore_frame(nodes, adj).collect()}
    for i in range(6):
        assert got[i] == (True, 5)
    assert got[6] == (False, 0)
    assert got[7] == (False, 0)


def test_fixture_graph_splits_nonvacuously(spark):
    rows = kcore_membership(spark, "/root/testdata/sf0.001").collect()
    inside = [r for r in rows if r.in_core]
    outside = [r for r in rows if not r.in_core]
    assert inside and outside
    assert all(r.core_deg == 0 for r in outside)
    assert all(r.core_deg >= 1 for r in inside)
