"""Filter agreement: hand-computed kappa on constructed boolean frames
(perfect / chance / constant-filter degenerate), corpus discrimination."""

from __future__ import annotations

from paper2llm_spark.operators.webagree import (
    MICRO, filter_agreement, filter_agreement_frame,
)


def _rows(spark, triples):
    funnel = spark.createDataFrame(
        triples, "gopher_keep boolean, c4_keep boolean, clf_keep boolean")
    return {r.pair: r for r in filter_agreement_frame(funnel).collect()}


def test_perfect_agreement_kappa_one(spark):
    """gopher == c4 on every doc (and both values occur) -> kappa = 1e6
    exactly; clf constant -> kappa vs a MIXED filter is 0 (a constant
    filter carries no information beyond chance)."""
    rows = _rows(
        spark,
        [(True, True, True), (False, False, True),
         (True, True, True), (False, False, True)],
    )
    g_c4 = rows["gopher~c4"]
    assert g_c4.agree_micro == MICRO
    assert g_c4.kappa_micro == MICRO
    assert rows["gopher~classifier"].kappa_micro == 0
    assert rows["c4~classifier"].kappa_micro == 0


def test_both_constant_kappa_null(spark):
    """pe = 1 exactly when both filters are the same constant — kappa
    undefined, emitted NULL."""
    rows = _rows(
        spark,
        [(True, True, True), (False, True, True),
         (True, True, True), (False, True, True)],
    )
    assert rows["c4~classifier"].kappa_micro is None
    assert rows["c4~classifier"].agree_micro == MICRO
    assert rows["gopher~c4"].kappa_micro == 0


def test_chance_agreement_kappa_zero(spark):
    """Independent 50/50 filters with the exact 2x2 contingency of
    independence -> po == pe -> kappa = 0."""
    rows = _rows(
        spark,
        [(True, True, True), (True, False, True),
         (False, True, True), (False, False, True)],
    )
    r = rows["gopher~c4"]
    assert r.agree_micro == MICRO // 2
    assert r.kappa_micro == 0


def test_hand_computed_kappa(spark):
    """n=5, nx=3, ny=2, n11=2, n00=2: po=4/5, pe=(6+6)/25 ->
    kappa = (4*5-12)/(25-12) = 8/13."""
    rows = _rows(
        spark,
        [(True, True, True), (True, True, True), (True, False, True),
         (False, False, True), (False, False, True)],
    )
    r = rows["gopher~c4"]
    assert r.n11 == 2 and r.n00 == 2
    assert r.kappa_micro == (8 * MICRO) // 13


def test_corpus_kappas_discriminate(spark):
    rows = {r.pair: r for r in
            filter_agreement(spark, "/root/testdata/sf0.001").collect()}
    assert len(rows) == 3
    for r in rows.values():
        assert r.kappa_micro is not None
        assert -MICRO <= r.kappa_micro <= MICRO
        assert r.kappa_micro < r.agree_micro  # chance-corrected < raw
    # the three filters measure different things: not all kappas equal
    assert len({r.kappa_micro for r in rows.values()}) >= 2
