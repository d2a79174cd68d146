"""ANN recall audit — consistency with the three composed rankers
and universe completeness."""

from __future__ import annotations

from paper2llm_spark.operators.similarity import (
    N_QUERIES, TOPK, cosine_topk, ivf_topk, pq_topk,
)
from paper2llm_spark.operators.webrecall import MICRO, ann_recall

SF = "/root/testdata/sf0.001"


def test_recall_matches_composed_rankers(spark):
    truth: dict[int, set] = {}
    for r in cosine_topk(spark, SF).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {
        "ivf": ivf_topk(spark, SF).collect(),
        "pq": pq_topk(spark, SF).collect(),
    }
    want: dict[tuple, int] = {}
    for method, rows in approx.items():
        for r in rows:
            if r.neighbor_id in truth.get(r.query_id, set()):
                key = (method, r.query_id)
                want[key] = want.get(key, 0) + 1
    got = {(r.method, r.query_id): r for r in ann_recall(spark, SF).collect()}
    # one row per (method, query) — misses included as zero
    assert set(got) == {(m, q) for m in ("ivf", "pq")
                        for q in range(N_QUERIES)}
    for key, r in got.items():
        assert r.hits == want.get(key, 0), key
        assert r.recall_micro == r.hits * MICRO // TOPK
        assert 0 <= r.hits <= TOPK


def test_compression_costs_recall_on_fixture(spark):
    rows = ann_recall(spark, SF).collect()
    by_m: dict[str, int] = {}
    for r in rows:
        by_m[r.method] = by_m.get(r.method, 0) + r.hits
    # the cell-pruned IVF keeps more of the exact top-K than the
    # 4x8-code PQ on the fixture — the audit actually separates the
    # two methods (and neither is vacuously perfect)
    assert by_m["ivf"] != by_m["pq"]
    assert any(r.recall_micro < MICRO for r in rows)
