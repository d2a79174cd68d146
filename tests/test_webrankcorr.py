"""Centrality rank agreement — replay from the composed solvers'
outputs and statistic bounds."""

from __future__ import annotations

import math

from paper2llm_spark.operators.webgraph import hits_scores, pagerank
from paper2llm_spark.operators.webrankcorr import (
    MICRO, TOP_K, rank_correlation,
)

SF = "/root/testdata/sf0.001"


def test_replay_from_solver_outputs(spark):
    pr = {r.doc_id: r.rank_micro for r in pagerank(spark, SF).collect()}
    ht = {r.doc_id: (r.auth_micro, r.hub_micro)
          for r in hits_scores(spark, SF).collect()}
    n = len(pr)

    def ranks(scores: dict) -> dict:
        order = sorted(scores, key=lambda d: (-scores[d], d))
        return {d: i + 1 for i, d in enumerate(order)}

    r_pr = ranks(pr)
    r_auth = ranks({d: v[0] for d, v in ht.items()})
    r_hub = ranks({d: v[1] for d, v in ht.items()})
    rows = {r.pair: r for r in rank_correlation(spark, SF).collect()}
    assert set(rows) == {"pr_vs_auth", "pr_vs_hub"}
    for pair, rb in (("pr_vs_auth", r_auth), ("pr_vs_hub", r_hub)):
        s = sum((r_pr[d] - rb[d]) ** 2 for d in pr)
        top = sum(1 for d in pr if r_pr[d] <= TOP_K and rb[d] <= TOP_K)
        r = rows[pair]
        assert r.n == n and r.sum_d2 == s and r.top_overlap == top
        want = math.floor(
            (1.0 - 6.0 * s / (float(n) * (float(n) * float(n) - 1.0)))
            * 1e6 + 0.5
        )
        assert r.rho_micro == want
        assert -MICRO <= r.rho_micro <= MICRO
        assert 0 <= r.top_overlap <= TOP_K
    # the two HITS sides correlate differently with PageRank on the
    # fixture graph — the statistic actually separates them
    assert rows["pr_vs_auth"].rho_micro != rows["pr_vs_hub"].rho_micro
