"""DoReMi weights — replay from the composed LM output and mixture
invariants."""

from __future__ import annotations

import math

import pandas as pd

from paper2llm_spark.operators.webdoremi import (
    EXP_CLAMP, EXP_K, MICRO, doremi_weights, exp_series,
)
from paper2llm_spark.operators.weblm import lm_perplexity

SF = "/root/testdata/sf0.001"


def test_replay_from_lm_output_and_mixture_invariants(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    source = dict(zip(docs["doc_id"], docs["source"]))
    per: dict[str, list] = {}
    for r in lm_perplexity(spark, SF).collect():
        d = per.setdefault(source[r.doc_id], [0, 0, 0])
        d[0] += 1
        d[1] += r.n_tokens
        d[2] += r.nll_micro
    g_mean = sum(v[2] for v in per.values()) \
        // sum(v[1] for v in per.values())
    masses = {
        s: exp_series((v[2] // v[1]) - g_mean) for s, v in per.items()
    }
    total_mass = sum(masses.values())
    rows = {r.source: r for r in doremi_weights(spark, SF).collect()}
    assert set(rows) == set(per)
    for s, v in per.items():
        r = rows[s]
        assert (r.n_docs, r.total_tokens) == (v[0], v[1])
        assert r.mean_nll_micro == v[2] // v[1]
        assert r.excess_micro == v[2] // v[1] - g_mean
        assert r.weight_micro == masses[s] * MICRO // total_mass
    # mixture properties: weights nearly sum to 1, harder sources get
    # MORE weight (the DoReMi direction), and the spread is real
    total = sum(r.weight_micro for r in rows.values())
    assert MICRO - len(rows) <= total <= MICRO
    by_excess = sorted(rows.values(), key=lambda r: r.excess_micro)
    assert by_excess[-1].weight_micro > by_excess[0].weight_micro
    assert len({r.weight_micro for r in rows.values()}) > 1


def test_exp_series_tracks_libm_and_clamps():
    """The frozen integer series is a faithful exp (within truncation
    loss) and saturates at ±EXP_CLAMP; EXP_K terms suffice at the
    clamp boundary."""
    for x in (-15 * MICRO, -5 * MICRO, -1, 0, 1, 123_456,
              3 * MICRO, EXP_CLAMP, 15 * MICRO):
        xc = max(min(x, EXP_CLAMP), -EXP_CLAMP)
        want = math.exp(xc / MICRO) * MICRO
        got = exp_series(x)
        assert abs(got - want) <= max(2.0, want * 1e-4), (x, got, want)
    assert exp_series(EXP_CLAMP) == exp_series(2 * EXP_CLAMP)
    assert exp_series(-EXP_CLAMP) == exp_series(-3 * EXP_CLAMP)
    assert EXP_K >= 40
