"""Degree assortativity — hand graphs with known sign and the exact
rational identity."""

from __future__ import annotations

from itertools import combinations

from paper2llm_spark.operators.webassort import (
    assortativity_frame, degree_assortativity,
)


def _adj(spark, arcs):
    return spark.createDataFrame(
        arcs + [(b, a) for a, b in arcs], "u long, v long"
    )


def test_star_is_maximally_disassortative(spark):
    # star K_{1,4}: every edge joins deg 4 to deg 1 -> r = -1 exactly
    got = assortativity_frame(
        _adj(spark, [(0, i) for i in range(1, 5)])
    ).collect()[0]
    assert got.m_arcs == 8
    assert got.r_micro == -1_000_000


def test_regular_graph_guard(spark):
    # 4-cycle: all degrees 2 -> zero variance -> frozen guard emits 0
    got = assortativity_frame(
        _adj(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    ).collect()[0]
    assert got.r_micro == 0 and got.mean_deg_milli == 2000


def test_disjoint_unequal_cliques_perfectly_assortative(spark):
    # K3 ∪ K4: every edge joins EQUAL degrees (2-2 or 3-3) while
    # degree varies across arcs -> perfect correlation, r = +1 exactly
    arcs = list(combinations(range(3), 2)) \
        + list(combinations(range(3, 7), 2))
    got = assortativity_frame(_adj(spark, arcs)).collect()[0]
    assert got.r_micro == 1_000_000


def test_bridged_cliques_exact_value(spark):
    # two 4-cliques + bridge: the bridge endpoints' elevated degree
    # sits mostly on edges to deg-3 partners -> slightly negative;
    # hand: (26*284-86^2)*1e6 / (26*290-86^2) = -12e6/144 = -83333.3,
    # and BOTH engines' integer division truncates toward zero
    # (Spark `div` == DuckDB `//` == -83333; Python's floor // would
    # give -83334 — the asymmetry to remember on negative ratios)
    arcs = list(combinations(range(4), 2)) \
        + list(combinations(range(4, 8), 2)) + [(0, 4)]
    got = assortativity_frame(_adj(spark, arcs)).collect()[0]
    assert got.r_micro == -83_333


def test_fixture_value_in_range(spark):
    got = degree_assortativity(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert -1_000_000 <= got.r_micro <= 1_000_000
    assert got.m_arcs > 0 and got.mean_deg_milli > 0
