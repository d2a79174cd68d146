"""Rmgarbage OCR-garbage rules: per-rule hand replay on crafted tokens,
multi-rule archetypes, planted-noise polarity — semantics beyond the
driver's hash gate."""

from __future__ import annotations

from paper2llm_spark.operators.webgarbage import GARBAGE, garbage_frame


def _stats(spark, text: str):
    df = spark.createDataFrame(
        [(1, text)], "doc_id long, ocr_text string"
    )
    return garbage_frame(df).collect()[0]


def test_each_rule_fires_on_its_archetype(spark):
    # L: >40 chars (the 45-i token also trips R and the no-consonant V)
    r = _stats(spark, "clean words " + "i" * 45)
    assert (r.n_rule_l, r.n_rule_r, r.n_rule_v) == (1, 1, 1)
    assert r.n_garbage == 1 and r.n_tokens == 3
    # A: alnum minority
    r = _stats(spark, "ok )(*&^%$(")
    assert r.n_rule_a == 1 and r.n_garbage == 1
    # R: 4+ identical consecutive chars within the frozen alphabet
    r = _stats(spark, "okay loooooong")
    assert r.n_rule_r == 1 and r.n_rule_l == 0
    # V: no vowels / no consonants on 3+ all-letter tokens
    r = _stats(spark, "bcdfgh aeiou ab ok")
    assert r.n_rule_v == 2  # 'ab'/'ok' too short to be judged
    # P: 2+ interior non-alnum (edges exempt)
    r = _stats(spark, "a;;b;;c (edge) end.")
    assert r.n_rule_p == 1  # parens/dot sit on token edges
    # C: case flip inside a token
    r = _stats(spark, "aBcDeFgH CamelCase UPPER lower")
    assert r.n_rule_c == 2  # archetype + CamelCase ('lC')


def test_clean_text_is_garbage_free(spark):
    r = _stats(spark, "a perfectly ordinary sentence with clean words")
    assert r.n_garbage == 0
    assert r.garbage_ratio_micro == 0


def test_ratio_is_exact_micro(spark):
    r = _stats(spark, "good " + GARBAGE["gv"] + " fine also")
    assert r.n_tokens == 4 and r.n_garbage == 1
    assert r.garbage_ratio_micro == 1_000_000 // 4


def test_corpus_polarities(spark):
    from paper2llm_spark.operators.webgarbage import ocr_garbage

    rows = ocr_garbage(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    clean = [r for r in rows if r.n_garbage == 0]
    dirty = [r for r in rows if r.n_garbage > 0]
    assert clean and dirty  # both polarities planted
    for k in "larvpc":
        assert any(r[f"n_rule_{k}"] > 0 for r in rows), k
