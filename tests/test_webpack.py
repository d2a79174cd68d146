"""Packing-efficiency audit — hand arithmetic replay and fixture
polarity/identity invariants."""

from __future__ import annotations

from paper2llm_spark.operators.webpack import (
    CTX_SIZES, MICRO, pack_efficiency, pack_efficiency_frame,
)

SF = "/root/testdata/sf0.001"


def test_hand_corpus_exact(spark):
    # token counts: 3, 70, 0 (empty doc contributes no chunks)
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, " ".join(["t"] * 70)), (2, "")],
        "doc_id long, text string",
    )
    got = {r.ctx: r for r in pack_efficiency_frame(docs).collect()}
    assert set(got) == set(CTX_SIZES)
    total = 73
    for c in CTX_SIZES:
        chunks = (3 + c - 1) // c + (70 + c - 1) // c
        trunc = max(3 - c, 0) + max(70 - c, 0)
        r = got[c]
        assert (r.n_docs, r.total_tokens) == (3, total)
        assert r.n_chunks == chunks
        assert r.pad_tokens == chunks * c - total
        assert r.pad_rate_micro == (chunks * c - total) * MICRO // (chunks * c)
        assert r.trunc_tokens == trunc
        assert r.trunc_rate_micro == trunc * MICRO // total
    # ctx=32 splits the 70-token doc into 3 chunks and truncates 38
    assert got[32].n_chunks == 1 + 3 and got[32].trunc_tokens == 38


def test_fixture_polarities_and_identities(spark):
    rows = {r.ctx: r for r in pack_efficiency(spark, SF).collect()}
    assert set(rows) == set(CTX_SIZES)
    # both loss modes fire somewhere on the fixture
    assert rows[32].trunc_tokens > 0
    assert all(r.pad_tokens > 0 for r in rows.values())
    # padding monotone in ctx (chunks shrink, boundaries coarsen)
    pads = [rows[c].pad_tokens for c in sorted(CTX_SIZES)]
    assert pads == sorted(pads)
    for r in rows.values():
        assert r.pad_tokens == r.n_chunks * r.ctx - r.total_tokens
        assert 0 <= r.pad_rate_micro < MICRO
        assert 0 <= r.trunc_rate_micro < MICRO
