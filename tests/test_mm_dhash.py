"""Image dHash: fake-grid replay, band decomposition, pigeonhole
property, mapInPandas plumbing on the corpus."""

from __future__ import annotations

import hashlib

from paper2llm_spark.operators.multimodal import (
    DHASH_BAND_BITS, DHASH_COLS, DHASH_ROWS, image_dhash, mm_image_dhash,
)
import pytest


def _replay(payload: bytes) -> int:
    digest = hashlib.md5(payload).hexdigest()

    def p(x, y):
        return int(
            hashlib.md5(f"{digest}:{x}:{y}".encode()).hexdigest()[:2], 16)

    h = 0
    for y in range(DHASH_ROWS):
        for x in range(DHASH_COLS):
            if p(x + 1, y) > p(x, y):
                h |= 1 << (y * DHASH_COLS + x)
    return h


def test_fake_grid_replay():
    for payload in (b"hello", b"", b"x" * 1000):
        assert image_dhash(payload) == _replay(payload)
        assert 0 <= image_dhash(payload) < 1 << (DHASH_ROWS * DHASH_COLS)


def test_real_decode_seam_is_loud():
    with pytest.raises(NotImplementedError):
        image_dhash(b"img", use_fake=False)


def test_identical_payloads_identical_hash():
    assert image_dhash(b"same bytes") == image_dhash(b"same bytes")
    assert image_dhash(b"same bytes") != image_dhash(b"other bytes")


def test_corpus_bands_decompose(spark):
    rows = mm_image_dhash(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    mask = (1 << DHASH_BAND_BITS) - 1
    for r in rows[:50]:
        assert r.dhash56 == sum(
            getattr(r, f"band{i}") << (DHASH_BAND_BITS * i)
            for i in range(4)
        )
        for i in range(4):
            assert 0 <= getattr(r, f"band{i}") <= mask
    # hashes spread: no fake-grid collapse onto few values
    assert len({r.dhash56 for r in rows}) > 400


def test_pigeonhole_band_property():
    """hamming(a, b) <= 4 with 4 disjoint 14-bit bands -> at least one
    band identical (the banded equi-join's recall guarantee)."""
    h = _replay(b"doc")
    flipped = h ^ 0b1011  # 3 bit flips, all inside band0
    bands = lambda v: [  # noqa: E731
        (v >> (DHASH_BAND_BITS * i)) & ((1 << DHASH_BAND_BITS) - 1)
        for i in range(4)
    ]
    assert sum(a == b for a, b in zip(bands(h), bands(flipped))) >= 3
