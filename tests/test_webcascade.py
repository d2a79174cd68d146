"""Extractor fallback cascade: per-class arm selection, output gates in
both polarities, order-stable reassembly — semantics beyond the driver's
hash gate."""

from __future__ import annotations

import hashlib

from paper2llm_spark.operators.webcascade import (
    MIN_EXTRACT_CHARS,
    cascade_frame,
    extract_cascade,
)


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_cascade_arm_per_planted_class(spark):
    """Every document lands in the arm its planted page class dictates:
    cls 0 article -> justext, cls 1 bare listing -> cetr, cls 2
    link-farm stub -> raw."""
    rows = extract_cascade(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    expected = {0: "justext", 1: "cetr", 2: "raw"}
    for r in rows:
        doc_id = int(r.url.rsplit("/", 1)[1])
        assert r.extractor == expected[_h(f"{doc_id}:cls") % 3], r.url
    # every arm fires (gates verified in both polarities)
    assert {r.extractor for r in rows} == {"justext", "cetr", "raw"}
    # gated arms only fire above the sanity threshold; raw is ungated
    for r in rows:
        if r.extractor != "raw":
            assert r.n_chars >= MIN_EXTRACT_CHARS


def _run(spark, html: str):
    df = spark.createDataFrame(
        [("https://t/1", html.encode())], "url string, html binary"
    )
    return cascade_frame(df).collect()[0]


def test_cascade_gates_handcrafted(spark):
    stop_para = "with the alpha of them " * 12  # stopword-rich, >200 chars
    bare_para = "xalpha xbeta xgamma xdelta " * 12  # stopword-free
    # jusText accepts: long stopword-rich paragraph
    r = _run(spark, f"<html><body><p>{stop_para}</p></body></html>")
    assert r.extractor == "justext"
    assert r.n_chars >= MIN_EXTRACT_CHARS
    # jusText rejects (no stopwords -> every block bad), CETR accepts
    r = _run(spark, f"<html><body><p>{bare_para}</p></body></html>")
    assert r.extractor == "cetr"
    # both classifiers below the gate -> raw baseline, never gated
    r = _run(
        spark,
        '<html><head><title>x</title></head><body>\n'
        '<div><a href="/">Home</a> <a href="/b">About</a></div>\n'
        "<div>tiny</div>\n</body></html>",
    )
    assert r.extractor == "raw"
    assert r.n_chars == len("Home About tiny")


def test_cascade_reassembly_is_block_ordered(spark):
    """Two good blocks must reassemble in block order: the text hash of
    (para1 \\n para2) differs from the swapped order."""
    p1 = "with the alpha of them " * 12
    p2 = "with the omega of them " * 12
    r12 = _run(spark, f"<html><body><p>{p1}</p><p>{p2}</p></body></html>")
    r21 = _run(spark, f"<html><body><p>{p2}</p><p>{p1}</p></body></html>")
    assert r12.extractor == r21.extractor == "justext"
    assert r12.n_chars == r21.n_chars
    assert r12.text_hash60 != r21.text_hash60
    expected = int(
        hashlib.md5(f"{p1.strip()}\n{p2.strip()}".encode())
        .hexdigest()[:15], 16)
    assert r12.text_hash60 == expected
