"""TextRank over the corpus co-occurrence graph (webtextrank.py) —
hand-computed 3-round exact-integer PageRank on a 3-node star."""

from __future__ import annotations

from paper2llm_spark.operators.webtextrank import MIN_CO, textrank_frame


def _ranks(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.w: r.rank_micro for r in textrank_frame(df).collect()}


def test_textrank_star_hand_computed(spark):
    # "x y" and "x z" each co-occur 3x (>= MIN_CO) -> star centered on
    # x (deg 2); y, z leaves (deg 1). Hand-rolled rounds (init 1e6,
    # 150_000 + 85*s div 100):
    #   r1: x 1_850_000, y=z 575_000
    #   r2: x 1_127_500, y=z 936_250
    #   r3: x 1_741_625, y=z 629_187
    got = _ranks(spark, [(0, "x y x y x y"), (1, "x z x z x z")])
    assert got == {"x": 1_741_625, "y": 629_187, "z": 629_187}


def test_textrank_min_cooccurrence_gate(spark):
    # "p q" appears only twice (< MIN_CO=3): no edge, no nodes at all
    assert MIN_CO == 3
    got = _ranks(spark, [(0, "p q p q")])
    assert got == {}


def test_textrank_edges_are_undirected_and_loopless(spark):
    # (x,y) 3x in one direction only still yields BOTH arcs after the
    # undirected unify; "x x" adjacency (self-loop) is dropped entirely
    got = _ranks(spark, [(0, "x y a x y a x y"), (1, "x x x x x x")])
    assert set(got) == {"x", "y"}
    # symmetric 2-node graph is a fixed point at the init value
    assert got["x"] == got["y"] == 1_000_000
