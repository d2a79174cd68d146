"""Semantic tests for text normalization and paragraph dedup. Cross-
engine equality vs DuckDB is covered by test_driver_contract.py; these
pin semantics on crafted inputs."""

from __future__ import annotations

from paper2llm_spark.operators.webnormalize import (
    BOILERPLATE_ALL,
    BOILERPLATE_EVEN,
    _synth_paragraph_lines,
    normalize_frame,
    paragraph_dedup_frame,
)

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _doc(i, text):
    return (i, text, "en", "s0", len(text))


def test_nfc_composes_and_cleans(spark):
    import hashlib
    import unicodedata

    decomposed = "Café has\x07 ctrl\tand \t runs"
    out = normalize_frame(
        spark.createDataFrame([_doc(1, decomposed)], DOC_SCHEMA)
    ).collect()[0]
    expect = unicodedata.normalize("NFC", decomposed)
    expect = expect.replace("\x07", "")
    expect = "Café has ctrl and runs"
    assert out["changed"] is True
    assert out["n_after"] == len(expect)
    assert out["norm_md5"] == hashlib.md5(expect.encode()).hexdigest()


def test_nfc_identity_on_clean_ascii(spark):
    out = normalize_frame(
        spark.createDataFrame([_doc(1, "already clean text")], DOC_SCHEMA)
    ).collect()[0]
    assert out["changed"] is False
    assert out["n_before"] == out["n_after"]


def test_paragraph_dedup_drops_repeated_boilerplate(spark):
    # 9-token docs -> 2 content sentences each (8 + 1) + boilerplate
    docs = [
        _doc(i, " ".join(f"w{i}t{k}" for k in range(9))) for i in range(6)
    ]
    lines = _synth_paragraph_lines(spark.createDataFrame(docs, DOC_SCHEMA))
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup_frame(lines).collect()
    }
    # doc 0 is the corpus-wide keeper of both boilerplate lines
    assert out[0]["n_kept"] == out[0]["n_lines"]
    assert BOILERPLATE_ALL in out[0]["clean_text"]
    assert BOILERPLATE_EVEN in out[0]["clean_text"]
    # every other doc keeps its unique content but loses the boilerplate
    for i in range(1, 6):
        r = out[i]
        assert r["n_kept"] == r["n_lines"] - (2 if i % 2 == 0 else 1), i
        assert BOILERPLATE_ALL not in r["clean_text"], i
        assert BOILERPLATE_EVEN not in r["clean_text"], i
        assert f"w{i}t0" in r["clean_text"], i


def test_paragraph_dedup_keeps_first_occurrence_order(spark):
    # duplicate content line across docs: doc 1 keeps it, doc 3 loses it
    shared = " ".join(["same"] * 8)
    docs = [_doc(1, shared), _doc(3, shared)]
    lines = _synth_paragraph_lines(spark.createDataFrame(docs, DOC_SCHEMA))
    out = {
        r["doc_id"]: r for r in paragraph_dedup_frame(lines).collect()
    }
    assert out[1]["clean_text"].startswith(shared + ".")
    assert not out[3]["clean_text"].startswith(shared)
