"""Recrawl-rate estimation — semantics beyond the driver's hash gate:
the Cho estimator table, determinism, tier monotonicity, class split."""

from __future__ import annotations

import hashlib
import math

SF = "/root/testdata/sf0.001"


def test_lambda_table_is_the_cho_estimator():
    from paper2llm_spark.operators.webrecrawl import LAMBDA_MICRO, N_VISITS

    for x in range(N_VISITS + 1):
        want = math.floor(
            -math.log((N_VISITS - x + 0.5) / (N_VISITS + 0.5)) * 1e6 + 0.5
        )
        assert LAMBDA_MICRO[x] == want
    # strictly increasing in observed changes; 0 changes -> 0 rate
    assert LAMBDA_MICRO[0] == 0
    assert all(a < b for a, b in zip(LAMBDA_MICRO, LAMBDA_MICRO[1:]))


def test_matches_python_replay(spark):
    from paper2llm_spark.operators.webrecrawl import (
        HOT_MICRO, LAMBDA_MICRO, N_VISITS, WARM_MICRO, _RATES,
        recrawl_priority,
    )

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = recrawl_priority(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        d = r["doc_id"]
        rate = _RATES[h(f"cls-{d}") % 3]
        changes = sum(
            1 for e in range(1, N_VISITS + 1)
            if h(f"chg-{d}-{e}") % 100 < rate
        )
        lam = LAMBDA_MICRO[changes]
        tier = ("hot" if lam >= HOT_MICRO
                else "warm" if lam >= WARM_MICRO else "cold")
        assert (r["n_visits"], r["n_changes"], r["lambda_micro"],
                r["tier"]) == (N_VISITS, changes, lam, tier), d


def test_tiers_split_and_track_volatility(spark):
    """All three tiers must occur, and the news-class (60%) docs must
    be hot more often than the static-class (5%) docs."""
    from paper2llm_spark.operators.webrecrawl import _RATES, recrawl_priority

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = recrawl_priority(spark, SF).collect()
    tiers = {r["tier"] for r in rows}
    assert tiers == {"hot", "warm", "cold"}
    by_class: dict[int, list] = {0: [], 1: [], 2: []}
    for r in rows:
        by_class[h(f"cls-{r['doc_id']}") % 3].append(r["tier"])
    frac_hot = [
        sum(t == "hot" for t in v) / len(v) for v in by_class.values()
    ]
    # _RATES = (5, 25, 60): hot fraction must increase with the rate
    assert frac_hot[0] < frac_hot[2]
    assert frac_hot[0] < 0.10 and frac_hot[2] > 0.40, frac_hot
