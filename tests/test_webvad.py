"""Energy VAD — full Python re-derivation of the frozen synthesis for
two docs, plus structural invariants."""

from __future__ import annotations

import hashlib

from paper2llm_spark.operators.webvad import (
    ENERGY_MIN, FRAME, N_FRAMES, vad_frame,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _expected(doc_id: int):
    speech = []
    for f in range(N_FRAMES):
        amp = 1000 if _h60(f"{doc_id}:f{f}") % 3 != 0 else 10
        e = sum(
            (_h60(f"{doc_id}:s{i}") % (2 * amp + 1) - amp) ** 2
            for i in range(f * FRAME, (f + 1) * FRAME)
        ) // FRAME
        speech.append(e > ENERGY_MIN)
    segs, run = [], 0
    for s in speech:
        if s:
            run += 1
        elif run:
            segs.append(run)
            run = 0
    if run:
        segs.append(run)
    return sum(speech), len(segs), max(segs, default=0)


def test_vad_matches_python_rederivation(spark):
    docs = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    got = {r.doc_id: (r.n_speech, r.n_segments, r.longest_seg)
           for r in vad_frame(docs).collect()}
    for d in (0, 1, 2):
        assert got[d] == _expected(d), d


def test_vad_invariants_on_fixture(spark):
    from paper2llm_spark.operators.webvad import audio_vad

    rows = audio_vad(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    for r in rows:
        assert r.n_frames == N_FRAMES
        assert 0 <= r.longest_seg <= r.n_speech <= N_FRAMES
        assert (r.n_segments == 0) == (r.n_speech == 0)
