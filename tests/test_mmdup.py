"""Multimodal near-dup pairs + shot boundaries — plant replay, band
pigeonhole polarity, hamming verification, and shot-grid structure."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from paper2llm_spark.operators.mmdup import (
    HAM_MAX, JITTER_EVERY, SHOT_LEN, SHOT_THRESH,
    pairs_from_hashes, plant_id, plant_variants, shot_boundaries_frame,
)

SF = "/root/testdata/sf0.001"


def _mask(doc_id: int) -> int:
    m = 0
    for i in range(1, doc_id % 4 + 1):
        m ^= 1 << ((doc_id * 13 + i * 17) % 56)
    return m


def _hashes(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, dhash56 long")


def test_plant_mask_replay(spark):
    # doc 21: k = 1 flip at (21*13 + 17) % 56 = 10
    got = plant_variants(_hashes(spark, [(21, 0b1100)])).collect()
    assert len(got) == 1
    assert got[0].doc_id == plant_id(21) == -22
    assert got[0].dhash56 == 0b1100 ^ (1 << 10)
    assert _mask(21) == 1 << 10
    # doc 28: k = 0 -> exact re-ingest
    got = plant_variants(_hashes(spark, [(28, 77)])).collect()
    assert got[0].dhash56 == 77


def test_pigeonhole_polarity(spark):
    # (1, 3): hamming 3 -> on at least one clean band -> found
    # (1, 2): band0 collides (low 14 bits zero) but hamming 20 -> the
    #         verifier must reject the candidate
    far = sum(1 << b for b in range(20, 40))
    rows = [(1, 0), (2, far), (3, 0b111)]
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in pairs_from_hashes(_hashes(spark, rows)).collect()}
    assert got == {(1, 3): 3}


def test_planted_pairs_all_recovered(spark):
    from paper2llm_spark.operators.mmdup import mm_dhash_pairs

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in mm_dhash_pairs(spark, SF).collect()}
    planted = [int(d) for d in docs["doc_id"] if d % 7 == 0]
    assert planted
    for d in planted:
        # negative planted id sorts below its base -> (planted, base)
        key = (plant_id(d), d)
        assert key in pairs, key
        assert pairs[key] == bin(_mask(d)).count("1")
    assert all(h <= HAM_MAX for h in pairs.values())


def test_frame_hash_replay_and_boundaries(spark):
    # 110-byte payload -> 11 frames -> shots {0,1,2}, boundaries at 5, 10
    text = "x" * 110
    docs = spark.createDataFrame([(3, text.encode())],
                                 "doc_id long, payload binary")
    got = {r.frame_idx: r.hamming
           for r in shot_boundaries_frame(docs).collect()}
    assert set(got) == {5, 10}

    dg = hashlib.md5(text.encode()).hexdigest()

    def shot_hash(s: int) -> int:
        return int(hashlib.md5(f"{dg}:{s}".encode()).hexdigest()[:14], 16)

    def frame_hash(doc_id: int, f: int) -> int:
        h = shot_hash(f // SHOT_LEN)
        if f % JITTER_EVERY == 1:
            h ^= 1 << ((doc_id * 7 + f * 31) % 56)
        return h

    for b in (5, 10):
        want = bin(frame_hash(3, b - 1) ^ frame_hash(3, b)).count("1")
        assert got[b] == want and want > SHOT_THRESH


def test_shot_boundaries_sit_on_shot_grid(spark):
    from paper2llm_spark.operators.mmdup import mm_shot_boundaries

    rows = mm_shot_boundaries(spark, SF).collect()
    assert rows
    assert all(r.frame_idx % SHOT_LEN == 0 for r in rows)
    # every multi-shot doc fires exactly (n_shots - 1) boundaries:
    # within-shot jitter stays <= 2 bits, cross-shot hashes are
    # uncorrelated (~28 bits)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        n_frames = max(len(text.encode()) // 10, 1)
        n_shots = math.ceil(n_frames / SHOT_LEN)
        if n_shots > 1:
            want[int(doc_id)] = n_shots - 1
    counts: dict[int, int] = {}
    for r in rows:
        counts[r.doc_id] = counts.get(r.doc_id, 0) + 1
    assert counts == want
