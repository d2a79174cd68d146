"""Shot statistics — replay from the composed boundary detector and
segment arithmetic."""

from __future__ import annotations

import pandas as pd

from paper2llm_spark.operators.mmdup import mm_shot_boundaries
from paper2llm_spark.operators.webshotstats import MICRO, shot_stats

SF = "/root/testdata/sf0.001"


def test_replay_from_boundaries(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    n_frames = {
        int(d): max(len(t.encode()) // 10, 1)
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    bounds: dict[int, list] = {}
    for r in mm_shot_boundaries(spark, SF).collect():
        bounds.setdefault(r.doc_id, []).append(r.frame_idx)
    rows = {r.doc_id: r for r in shot_stats(spark, SF).collect()}
    assert set(rows) == set(n_frames)
    for d, nf in n_frames.items():
        bs = sorted(bounds.get(d, []))
        segs = [b - a for a, b in zip([0] + bs, bs + [nf])]
        r = rows[d]
        assert r.n_frames == nf
        assert r.n_boundaries == len(bs)
        assert r.n_shots == len(bs) + 1
        assert r.mean_shot_len_micro == nf * MICRO // (len(bs) + 1)
        assert r.max_shot_len == max(segs), d
    # both single-shot and multi-shot docs exist
    assert any(r.n_boundaries == 0 for r in rows.values())
    assert any(r.n_boundaries > 0 for r in rows.values())
