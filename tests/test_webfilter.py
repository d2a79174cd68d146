"""Semantic tests for the ingest-gate filters (Bloom dedup pre-pass,
UT1-style URL blocklist). Cross-engine equality vs DuckDB is covered by
the parametrized oracle gate in test_driver_contract.py; these pin the
semantics on crafted inputs where the right answer is known by hand.
"""

from __future__ import annotations

import hashlib

from paper2llm_spark.operators.webfilter import (
    BLOCK_CATEGORIES,
    BLOOM_BITS,
    BLOOM_K,
    _BLOCK_SEED,
    blocklist_frame,
    bloom_prefilter_frame,
)

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _doc(i, text, source="s0"):
    return (i, text, "en", source, len(text))


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _bloom_bits(text: str) -> set[int]:
    dg = hashlib.md5(text.encode()).hexdigest()
    return {_h60(f"{dg}:{i}") % BLOOM_BITS for i in range(BLOOM_K)}


def test_bloom_members_hit_all_probes(spark):
    """Every even-id doc (the build slice) must come back maybe_seen —
    a Bloom filter has NO false negatives by construction."""
    docs = [_doc(i, f"content {i}") for i in range(20)]
    out = {
        r["doc_id"]: r
        for r in bloom_prefilter_frame(
            spark.createDataFrame(docs, DOC_SCHEMA)
        ).collect()
    }
    for i in range(0, 20, 2):
        assert out[i]["maybe_seen"] and out[i]["n_hits"] == BLOOM_K, i


def test_bloom_nonmembers_match_python_replay(spark):
    """Odd-id docs answer exactly what a hashlib replay of the filter
    answers — false positives included (determinism is the contract)."""
    docs = [_doc(i, f"content {i}") for i in range(40)]
    built = set()
    for i in range(0, 40, 2):
        built |= _bloom_bits(f"content {i}")
    out = {
        r["doc_id"]: r
        for r in bloom_prefilter_frame(
            spark.createDataFrame(docs, DOC_SCHEMA)
        ).collect()
    }
    for i in range(1, 40, 2):
        probes = _bloom_bits(f"content {i}")
        expect_hits = sum(b in built for b in _bloom_bits(f"content {i}"))
        # replay counts distinct bits; the operator counts the K probes.
        # They differ only when a doc's own probes collide — rebuild the
        # per-probe count to match the operator's semantics exactly
        dg = hashlib.md5(f"content {i}".encode()).hexdigest()
        expect_hits = sum(
            (_h60(f"{dg}:{k}") % BLOOM_BITS) in built for k in range(BLOOM_K)
        )
        assert out[i]["n_hits"] == expect_hits, i
        assert out[i]["maybe_seen"] == (expect_hits == BLOOM_K), i
        assert probes  # replay sanity


def test_bloom_duplicate_content_is_seen(spark):
    """An odd-id doc whose text equals an even-id doc's text is a TRUE
    member: identical digest -> identical probes -> all hits."""
    docs = [_doc(0, "shared bytes"), _doc(1, "shared bytes"),
            _doc(3, "unique odd bytes")]
    out = {
        r["doc_id"]: r["maybe_seen"]
        for r in bloom_prefilter_frame(
            spark.createDataFrame(docs, DOC_SCHEMA)
        ).collect()
    }
    assert out[0] and out[1]
    assert not out[3]


def test_blocklist_assignment_matches_seed(spark):
    docs = [_doc(i, "t", source=f"src{i % 4}") for i in range(8)]
    out = {
        r["doc_id"]: r
        for r in blocklist_frame(
            spark.createDataFrame(docs, DOC_SCHEMA)
        ).collect()
    }
    for i in range(8):
        src = f"src{i % 4}"
        h = _h60(f"{_BLOCK_SEED}{src}")
        blocked = h % 2 == 0
        r = out[i]
        assert r["host"] == f"{src}.test"
        assert r["blocked"] == blocked, src
        if blocked:
            assert r["category"] == BLOCK_CATEGORIES[h % len(BLOCK_CATEGORIES)]
        else:
            assert r["category"] is None
