"""UTS #39 homoglyph scan — mixed-script precision (pure-Cyrillic words
are NOT spoofs), script char counts, and skeleton folding."""

from __future__ import annotations

import hashlib

from paper2llm_spark.operators.webglyph import homoglyph_frame


def _rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r.asDict() for r in homoglyph_frame(df).collect()}


def test_mixed_token_is_spoof_pure_script_is_not(spark):
    # "pаypal" (Cyrillic а U+0430 inside Latin) is the attack shape;
    # "привет" is just Russian — counted but NOT a spoof.
    got = _rows(spark, ["pаypal login", "привет world"])
    assert got[0]["n_mixed_tokens"] == 1 and got[0]["spoof"] is True
    assert got[0]["n_cyrillic"] == 1
    assert got[1]["n_mixed_tokens"] == 0 and got[1]["spoof"] is False
    assert got[1]["n_cyrillic"] == 6


def test_greek_script_counted(spark):
    got = _rows(spark, ["micrοsoft site"])  # Greek omicron
    assert got[0]["n_greek"] == 1
    assert got[0]["spoof"] is True


def test_skeleton_folds_confusables_back_to_latin(spark):
    # folding "pаypal" -> "paypal": skeleton md5 equals the md5 of
    # the clean ASCII text
    got = _rows(spark, ["pаypal"])
    assert got[0]["skeleton_md5"] == hashlib.md5(b"paypal").hexdigest()


def test_clean_ascii_doc(spark):
    got = _rows(spark, ["plain ascii text"])
    r = got[0]
    assert (r["n_cyrillic"], r["n_greek"], r["n_mixed_tokens"]) == (0, 0, 0)
    assert r["spoof"] is False
