"""Within-doc line dedup — semantics beyond the driver's hash gate:
keep-first order preservation, blank-line handling, and the rebuilt
bytes."""

from __future__ import annotations

import hashlib

from paper2llm_spark.operators.weblinededup import (
    line_dedup, line_dedup_frame,
)

SF = "/root/testdata/sf0.001"


def _dedup(spark, texts: list[str]):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r for r in line_dedup_frame(df).collect()}


def test_keep_first_preserves_order(spark):
    t = "alpha\nbeta\nalpha\ngamma\nbeta\nalpha"
    r = _dedup(spark, [t])[0]
    assert (r.n_lines, r.n_kept) == (6, 3)
    expected = "alpha\nbeta\ngamma"
    assert r.dedup_md5 == hashlib.md5(expected.encode()).hexdigest()


def test_blank_lines_dedup_too(spark):
    t = "a\n\nb\n\nc"
    r = _dedup(spark, [t])[0]
    assert (r.n_lines, r.n_kept) == (5, 4)  # second blank dropped
    expected = "a\n\nb\nc"
    assert r.dedup_md5 == hashlib.md5(expected.encode()).hexdigest()


def test_single_line_untouched(spark):
    t = "just one line of prose"
    r = _dedup(spark, [t])[0]
    assert (r.n_lines, r.n_kept) == (1, 1)
    assert r.dedup_md5 == hashlib.md5(t.encode()).hexdigest()


def test_corpus_plants_both_branches(spark):
    out = line_dedup(spark, SF).collect()
    planted = [r for r in out if r.n_lines > 1]
    clean = [r for r in out if r.n_lines == 1]
    assert planted and clean
    # the planted tail repeats 'Subscribe...' 3x: exactly 2 dropped
    assert all(r.n_lines - r.n_kept == 2 for r in planted)
