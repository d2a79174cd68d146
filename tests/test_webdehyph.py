"""Dehyphenation repair — semantics beyond the driver's hash gate:
exact fused bytes, the hard-hyphen guard, and non-overlap chaining."""

from __future__ import annotations

import hashlib

from paper2llm_spark.operators.webdehyph import dehyphenate, dehyphenate_frame

SF = "/root/testdata/sf0.001"


def _run(spark, texts: list[str]):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r for r in dehyphenate_frame(df).collect()}


def test_soft_breaks_fused(spark):
    r = _run(spark, ["walk over-\nthe-\nline now"])[0]
    assert r.n_repairs == 2
    want = "walk overtheline now"
    assert r.repaired_md5 == hashlib.md5(want.encode()).hexdigest()


def test_hard_hyphen_untouched(spark):
    # uppercase on either side = proper noun / initialism: left alone
    t = "an X-\nray and a DNA-\nsequence"
    r = _run(spark, [t])[0]
    assert r.n_repairs == 0
    assert r.repaired_md5 == hashlib.md5(t.encode()).hexdigest()


def test_chain_is_non_overlapping(spark):
    # a-\nb-\nc: the consumed 'b' cannot start the second match
    r = _run(spark, ["a-\nb-\nc"])[0]
    assert r.n_repairs == 1
    assert r.repaired_md5 == hashlib.md5(b"ab-\nc").hexdigest()


def test_hyphen_before_uppercase_kept(spark):
    t = "the well-\nKnown fix"
    r = _run(spark, [t])[0]
    assert r.n_repairs == 0


def test_clean_text_identity(spark):
    t = "no wraps here, just prose with a normal-hyphen"
    r = _run(spark, [t])[0]
    assert r.n_repairs == 0
    assert r.repaired_md5 == hashlib.md5(t.encode()).hexdigest()


def test_corpus_plants_all_branches(spark):
    out = dehyphenate(spark, SF).collect()
    counts = {r.n_repairs for r in out}
    assert 0 in counts            # roll 2: untouched docs
    assert 2 in counts            # roll 1: the appended 2-break tail
    # roll 0 splice repairs 1 iff both neighbours are lowercase
    assert any(r.n_repairs == 1 for r in out)
