"""PR threshold sweep — confusion-matrix identities, monotone sweep
structure, and exact rate arithmetic."""

from __future__ import annotations

from paper2llm_spark.operators.webpr import (
    MICRO, THRESHOLDS, pr_curve, pr_curve_frame,
)

SF = "/root/testdata/sf0.001"


def test_hand_corpus_no_positives(spark):
    # every doc too short for Gopher -> label False everywhere:
    # tp = fn = 0, precision = recall = 0 at every threshold, and
    # fp + tn == n_docs
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta"), (2, "")],
        "doc_id long, text string",
    )
    rows = pr_curve_frame(docs).collect()
    assert {r.threshold_micro for r in rows} == set(THRESHOLDS)
    for r in rows:
        assert r.tp == 0 and r.fn == 0
        assert r.fp + r.tn == 3
        assert r.precision_micro == 0 and r.recall_micro == 0
        assert r.f1_micro == 0


def test_fixture_sweep_structure(spark):
    rows = {r.threshold_micro: r for r in pr_curve(spark, SF).collect()}
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert set(rows) == set(THRESHOLDS)
    n_pos = {r.tp + r.fn for r in rows.values()}
    assert len(n_pos) == 1 and n_pos.pop() > 0  # label independent of th
    for r in rows.values():
        assert r.tp + r.fp + r.fn + r.tn == n_docs
        assert r.precision_micro == r.tp * MICRO // max(r.tp + r.fp, 1)
        assert r.recall_micro == r.tp * MICRO // max(r.tp + r.fn, 1)
        p, q = r.precision_micro, r.recall_micro
        assert r.f1_micro == 2 * p * q // max(p + q, 1)
    # raising the threshold can only shrink the predicted-positive set
    ths = sorted(THRESHOLDS)
    tps = [rows[t].tp for t in ths]
    preds = [rows[t].tp + rows[t].fp for t in ths]
    assert tps == sorted(tps, reverse=True)
    assert preds == sorted(preds, reverse=True)
    # the sweep actually moves on the fixture
    assert len({(r.tp, r.fp) for r in rows.values()}) > 1
