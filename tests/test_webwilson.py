"""Wilson-score host ranking — hand-checked bound values and the
small-vs-large ranking inversion the statistic exists for."""

from __future__ import annotations

import math

from paper2llm_spark.operators.webwilson import (
    PASS_CHARS, wilson_frame, wilson_hosts,
)


def _wilson(k: int, n: int) -> int:
    v = (k + 1.9208 - 1.96 * math.sqrt(k * (n - k) / n + 0.9604)) \
        / (n + 3.8416)
    return math.floor(v * 1_000_000 + 0.5)


def _docs(spark, spec):
    """spec: [(source, n_pass, n_fail)] -> docs with one host each
    (N_HOSTS collapses because every doc_id maps somewhere; we instead
    test the frame on single-source groups via distinct sources)."""
    rows, i = [], 0
    for src, npass, nfail in spec:
        for _ in range(npass):
            rows.append((i, src, "x" * PASS_CHARS)); i += 1
        for _ in range(nfail):
            rows.append((i, src, "x")); i += 1
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_wilson_prefers_large_sample_over_perfect_tiny(spark):
    # 2/2 perfect vs 180/200 at 90%: naive says tiny wins, Wilson
    # reverses — exactly the ranking pathology the bound fixes
    assert _wilson(2, 2) < _wilson(180, 200)
    assert 2 * 1_000_000 // 2 > 180 * 1_000_000 // 200


def test_frame_matches_formula(spark):
    df = _docs(spark, [("s", 3, 1)])
    rows = wilson_frame(df).collect()
    # hosts are hash-split inside one source; re-aggregate to totals
    n = sum(r.n_docs for r in rows)
    k = sum(r.n_pass for r in rows)
    assert (n, k) == (4, 3)
    for r in rows:
        assert r.wilson_lo_micro == _wilson(r.n_pass, r.n_docs)
        assert r.naive_micro == r.n_pass * 1_000_000 // r.n_docs
        assert r.wilson_lo_micro < r.naive_micro or r.n_pass == 0


def test_fixture_hosts_split_and_bound_below_naive(spark):
    rows = wilson_hosts(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 100                    # hosts actually split
    assert any(r.n_pass < r.n_docs for r in rows)
    assert any(r.n_pass > 0 for r in rows)
    for r in rows:
        if r.n_pass > 0:
            assert r.wilson_lo_micro < r.naive_micro
