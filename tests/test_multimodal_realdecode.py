"""Real decode path (PGM/P5) for the multimodal seams — the round-4
"seam proven" ask: ``use_fake=False`` actually decodes a real image
format end-to-end (header parse -> box resample -> shared grid->bits
function), and the fake path consumes the SAME bit lattice, so the
band structure downstream of either path is identical by
construction."""

from __future__ import annotations

import hashlib

import pytest

from paper2llm_spark.operators.multimodal import (
    DHASH_COLS, DHASH_ROWS, decode_image, decode_pgm, dhash_from_grid,
    feature_vector, image_dhash, luminance_grid, resize_image,
)


def make_pgm(w: int, h: int, pix) -> bytes:
    """pix(x, y) -> 0..255"""
    body = bytes(pix(x, y) for y in range(h) for x in range(w))
    return b"P5\n# test fixture\n%d %d\n255\n" % (w, h) + body


def test_decode_pgm_header_and_pixels():
    img = make_pgm(5, 3, lambda x, y: 10 * y + x)
    w, h, px = decode_pgm(img)
    assert (w, h) == (5, 3)
    assert px[0] == 0 and px[4] == 4 and px[5 * 2 + 3] == 23


def test_decode_pgm_rejects_garbage():
    with pytest.raises(ValueError):
        decode_pgm(b"JFIF....")
    with pytest.raises(ValueError):
        decode_pgm(b"P5\n4 4\n255\nshort")


def test_decode_image_real_reports_header_dims():
    img = make_pgm(64, 48, lambda x, y: (x + y) % 256)
    meta = decode_image(img, use_fake=False)
    assert (meta["width"], meta["height"]) == (64, 48)
    assert meta["n_bytes"] == len(img)
    assert meta["digest"] == hashlib.md5(img).hexdigest()


def test_decode_image_real_raises_for_compressed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0JFIF", use_fake=False)


def test_real_dhash_gradient_sets_every_bit():
    # strictly increasing luminance left->right: every horizontal
    # comparison fires -> all 56 bits set; reversed -> none
    inc = make_pgm(64, 64, lambda x, y: x * 3)
    dec = make_pgm(64, 64, lambda x, y: 255 - x * 3)
    assert image_dhash(inc, use_fake=False) == (1 << 56) - 1
    assert image_dhash(dec, use_fake=False) == 0


def test_real_dhash_near_dup_is_near():
    base = make_pgm(64, 64, lambda x, y: (x * 7 + y * 13) % 256)
    noisy = bytearray(base)
    # flip one pixel hard: affects at most one grid cell -> <= 2 bits
    off = len(base) - 64 * 64 + 64 * 10 + 20
    noisy[off] = 255 - noisy[off]
    a = image_dhash(base, use_fake=False)
    b = image_dhash(bytes(noisy), use_fake=False)
    assert 0 <= bin(a ^ b).count("1") <= 2
    # while an unrelated image is far
    other = make_pgm(64, 64, lambda x, y: (x * 31 + y * 5 + 77) % 256)
    c = image_dhash(other, use_fake=False)
    assert bin(a ^ c).count("1") > 10


def test_fake_and_real_share_the_bit_lattice():
    """The fake path must be dhash_from_grid over its digest grid —
    same function, same band structure as the real path."""
    payload = b"any payload"
    digest = hashlib.md5(payload).hexdigest()

    def p(x: int, y: int) -> int:
        return int(
            hashlib.md5(f"{digest}:{x}:{y}".encode()).hexdigest()[:2], 16
        )

    assert image_dhash(payload, use_fake=True) == dhash_from_grid(p)
    assert 0 <= image_dhash(payload) < 1 << (DHASH_ROWS * DHASH_COLS)


def test_real_resize_roundtrips_as_pgm():
    img = make_pgm(32, 32, lambda x, y: x * 8 % 256)
    small = resize_image(img, 8, 8, use_fake=False)
    w, h, px = decode_pgm(small)
    assert (w, h) == (8, 8) and len(px) == 64
    # box averages preserve the left->right ramp ordering
    assert list(px[0:8]) == sorted(px[0:8])


def test_real_feature_vector_is_luminance_grid():
    img = make_pgm(40, 40, lambda x, y: 128)
    v = feature_vector(img, use_fake=False)
    assert len(v) == 16
    assert all(abs(x - 128 / 255.0) < 1e-6 for x in v)


def test_luminance_grid_degenerate_sizes():
    # image smaller than the grid: cells clamp to >= 1 source pixel
    img = make_pgm(3, 2, lambda x, y: 50)
    w, h, px = decode_pgm(img)
    grid = luminance_grid(px, w, h, DHASH_COLS + 1, DHASH_ROWS)
    assert len(grid) == DHASH_ROWS and len(grid[0]) == DHASH_COLS + 1
    assert all(v == 50 for row in grid for v in row)
