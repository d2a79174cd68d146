"""Calibration reliability bins — hand ntile replay, bin-arithmetic
re-derivation, and corpus-level partition/monotonicity invariants."""

from __future__ import annotations

import hashlib

from paper2llm_spark.operators.webcalib import (
    N_BINS, SHIFT, calibration_bins, calibration_bins_frame,
)
from paper2llm_spark.operators.webquality import QCLF_BUCKETS, QCLF_WEIGHTS

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _key(text: str) -> int:
    toks = [t for t in text.lower().split() if t]
    if not toks:
        return SHIFT
    sum_w = sum(QCLF_WEIGHTS[_h60(t) % QCLF_BUCKETS] for t in toks)
    return (sum_w + len(toks) * SHIFT) // len(toks)


def test_hand_corpus_bins_replay(spark):
    # 4 docs -> ntile(10) gives one per bin in key order; none passes
    # Gopher (too short), so pos_rate is 0 everywhere
    texts = {1: "alpha beta", 2: "gamma", 3: "delta epsilon zeta", 4: ""}
    docs = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    )
    rows = sorted(calibration_bins_frame(docs).collect(),
                  key=lambda r: r.bin)
    order = sorted(texts, key=lambda d: (_key(texts[d]), d))
    assert [r.bin for r in rows] == [1, 2, 3, 4]
    for r, doc in zip(rows, order):
        assert r.n == 1 and r.n_pos == 0 and r.pos_rate_micro == 0
        assert r.mean_score_micro == _key(texts[doc]) - SHIFT


def test_bins_partition_corpus_and_scores_monotone(spark):
    rows = sorted(calibration_bins(spark, SF).collect(),
                  key=lambda r: r.bin)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert [r.bin for r in rows] == list(range(1, N_BINS + 1))
    assert sum(r.n for r in rows) == n_docs
    # keys are sorted before binning, so bin means are nondecreasing
    means = [r.mean_score_micro for r in rows]
    assert means == sorted(means)
    # both polarities of the label reach the table
    assert any(r.n_pos > 0 for r in rows)
    assert any(r.n_pos < r.n for r in rows)
    for r in rows:
        assert r.pos_rate_micro == r.n_pos * SHIFT // r.n
