"""Co-citation / bibliographic coupling — pair counting on a hand
graph, the MIN_COUNT floor, and the pre-join degree cap."""

from __future__ import annotations

from paper2llm_spark.operators.webcocite import DEG_CAP, _pair_counts


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_cocitation_counts_shared_citers(spark):
    # sources 1,2,3 all cite {10, 11}; source 4 cites only 10 and 12
    e = _edges(
        spark,
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10), (3, 11), (4, 10), (4, 12)],
    )
    got = {
        (r.id_a, r.id_b): r.cnt
        for r in _pair_counts(e, "src", "dst", "cocite").collect()
    }
    assert got == {(10, 11): 3}  # (10,12) co-cited once -> below floor


def test_coupling_counts_shared_targets(spark):
    e = _edges(
        spark,
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10), (3, 99)],
    )
    got = {
        (r.id_a, r.id_b): r.cnt
        for r in _pair_counts(e, "dst", "src", "couple").collect()
    }
    # 1 and 2 share {10, 11}; 3 shares only {10} with each -> floor
    assert got == {(1, 2): 2}


def test_degree_cap_drops_hot_endpoint(spark):
    # one mega-hub dst linked by DEG_CAP + 2 sources, plus a planted
    # couple pair via two normal dsts: the hub contributes NO pairs
    hub = [(s, 1000) for s in range(DEG_CAP + 2)]
    normal = [(1, 10), (2, 10), (1, 11), (2, 11)]
    e = _edges(spark, hub + normal)
    got = {
        (r.id_a, r.id_b): r.cnt
        for r in _pair_counts(e, "dst", "src", "couple").collect()
    }
    assert got == {(1, 2): 2}
