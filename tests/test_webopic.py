"""OPIC — hand-replayed rounds, exact cash conservation, and the
dangling/virtual-node path on a 3-node graph (0→1, 0→2, 1→2; node 2
dangling)."""

from __future__ import annotations

from paper2llm_spark.operators.webopic import OPIC_INIT, opic_frame


def _run(spark):
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2)], "src long, dst long"
    )
    out = opic_frame(spark, nodes, edges, 3)
    return {r.doc_id: (r.cash_micro, r.hist_micro) for r in out.collect()}


def test_hand_replayed_three_rounds(spark):
    # round 1: everyone distributes 1e6; node 2 (dangling) banks to the
    #   virtual node.  cash: (0, 500000, 1500000), v = 1e6
    # round 2: v share = 333333 each (carry 1).
    #   cash: (333333, 333333, 833333), v = 1500001
    # round 3: v share = 500000 each (carry 1).
    #   cash: (500001, 666666, 999999), v = 833334
    got = _run(spark)
    assert got[0] == (500_001, 1_333_332)
    assert got[1] == (666_666, 1_833_333)
    assert got[2] == (999_999, 3_333_333)


def test_cash_conserved_to_the_unit(spark):
    # sum(cash) + virtual == n * INIT; virtual after round 3 is 833334
    got = _run(spark)
    assert sum(c for c, _ in got.values()) + 833_334 == 3 * OPIC_INIT


def test_dangling_history_counts_banked_cash(spark):
    # node 2 never has outlinks: its history is exactly the cash it
    # banked each round (1e6 + 1.5e6 + 833333)
    got = _run(spark)
    assert got[2][1] == 1_000_000 + 1_500_000 + 833_333
