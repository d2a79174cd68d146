"""Readability battery — semantics beyond the driver's hash gate:
pure-Python replay of the exact integer formulas, known-text sanity,
empty/degenerate docs."""

from __future__ import annotations

import re

SF = "/root/testdata/sf0.001"


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _py_readability(text: str):
    toks = [t for t in text.lower().split() if t]
    w = len(toks)
    s = max(1, len(re.findall(r"[.!?]+", text)))
    syl = sum(max(1, len(re.findall(r"[aeiouy]+", t))) for t in toks)
    alnum = sum(len(re.sub(r"[^a-z0-9]", "", t)) for t in toks)
    w1 = max(w, 1)
    fre = 206835000 - _tdiv(1015000 * w, s) - _tdiv(84600000 * syl, w1)
    fkgl = _tdiv(390000 * w, s) + _tdiv(11800000 * syl, w1) - 15590000
    ari = _tdiv(4710000 * alnum, w1) + _tdiv(500000 * w, s) - 21430000
    return (w, s, syl, fre, fkgl, ari)


def _run(spark, docs):
    from paper2llm_spark.operators.webreadability import readability_frame

    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_words"], r["n_sent"], r["n_syl"],
                      r["fre_micro"], r["fkgl_micro"], r["ari_micro"])
        for r in readability_frame(df).collect()
    }


def test_matches_python_replay(spark):
    docs = [
        (0, "The cat sat. The dog ran! Did it?"),
        (1, "Incomprehensibility characterizes multisyllabic vocabulary "
            "extraordinarily. Notwithstanding, comprehension deteriorates."),
        (2, ""),                          # empty doc: all-guard path
        (3, "no terminators here at all"),  # n_sent floor of 1
        (4, "xyzzy bcdfg 12345."),          # vowel-free + digit tokens
    ]
    got = _run(spark, docs)
    for d, text in docs:
        assert got[d] == _py_readability(text), d


def test_simple_text_easier_than_dense_text(spark):
    simple = "The cat sat on the mat. The dog ran to the park. It was fun."
    dense = ("Institutional epistemological frameworks necessitate "
             "comprehensive reconsideration of methodological presuppositions "
             "underlying contemporary historiographical scholarship.")
    got = _run(spark, [(0, simple), (1, dense)])
    assert got[0][3] > got[1][3]    # FRE: higher = easier
    assert got[0][4] < got[1][4]    # FK grade: lower = easier
    assert got[0][5] < got[1][5]    # ARI: lower = easier
    # absolute sanity: simple text reads around grade school level
    assert got[0][4] < 6_000_000 and got[1][4] > 14_000_000


def test_corpus_coverage(spark):
    from paper2llm_spark.operators.webreadability import readability

    rows = readability(spark, SF).collect()
    assert len(rows) == 500
    fres = [r["fre_micro"] for r in rows]
    assert min(fres) < max(fres), "vacuous: constant readability"
