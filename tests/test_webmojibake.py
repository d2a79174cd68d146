"""Mojibake repair — semantics beyond the driver's hash gate: exact
repair bytes, marker-vs-fixed accounting, and the clean branch."""

from __future__ import annotations

import hashlib

from paper2llm_spark.operators.webmojibake import (
    REPAIRS, _double_decode, mojibake_frame, mojibake_repair,
)

SF = "/root/testdata/sf0.001"


def _repair(spark, texts: list[str]):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r for r in mojibake_frame(df).collect()}


def test_classic_double_decode_repaired(spark):
    fixed = "déjà vu — it’s fixed"
    damaged = _double_decode(fixed)
    assert damaged != fixed  # the damage is real
    r = _repair(spark, [damaged])[0]
    assert r.is_mojibake == 1
    assert r.repaired_md5 == hashlib.md5(fixed.encode()).hexdigest()
    assert r.repaired_len == len(fixed)


def test_repair_table_is_the_real_double_decode(spark):
    # every table entry equals its repaired form's UTF-8 bytes
    # re-decoded as cp1252 (with latin-1 fallback for the C1 range)
    for damaged, fixed in REPAIRS:
        raw = fixed.encode("utf-8")
        try:
            redecoded = raw.decode("cp1252")
        except UnicodeDecodeError:
            redecoded = raw.decode("latin-1")
        assert redecoded == damaged, (damaged, fixed)


def test_fixed_counts_per_entry(spark):
    t = _double_decode("éé") + _double_decode("ñ") + " " + _double_decode("“") + "x"
    r = _repair(spark, [t])[0]
    assert r.n_fixed == 4  # 2x e-acute, 1x n-tilde, 1x open quote
    assert r.n_markers == 4  # 3x C3-marker + 1x E2-20AC marker


def test_unrepairable_residue_still_flagged(spark):
    # sharp-s damage is NOT in the 12-entry table: detected, not fixed
    t = "gr" + _double_decode("ß") + "e"
    r = _repair(spark, [t])[0]
    assert r.is_mojibake == 1 and r.n_fixed == 0
    assert r.n_markers == 1


def test_clean_ascii_untouched(spark):
    t = "plain ascii text stays plain"
    r = _repair(spark, [t])[0]
    assert r.is_mojibake == 0 and r.n_fixed == 0
    assert r.repaired_md5 == hashlib.md5(t.encode()).hexdigest()


def test_corpus_plants_both_branches(spark):
    out = mojibake_repair(spark, SF).collect()
    assert {r.is_mojibake for r in out} == {0, 1}
    assert any(r.n_fixed >= 5 for r in out)
