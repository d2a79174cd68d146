"""Code-vs-prose detection — semantics beyond the driver's hash gate:
the verdict rule on handcrafted code and prose bodies."""

from __future__ import annotations

from paper2llm_spark.operators.webcode import (
    code_detect, code_detect_frame, synth_code_docs,
)

SF = "/root/testdata/sf0.001"


def _detect(spark, texts: list[str]):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r for r in code_detect_frame(df).collect()}


def test_python_block_flags(spark):
    code = "def add(a, b):\n    return a + b;\nimport os\n"
    r = _detect(spark, [code])[0]
    assert r.is_code == 1
    assert r.kw_hits == 3  # 'def ', 'return', 'import '
    assert r.indent_lines == 1


def test_prose_does_not_flag(spark):
    prose = (
        "the quick brown fox jumps over the lazy dog and keeps "
        "running through the quiet field until dusk settles in"
    )
    r = _detect(spark, [prose])[0]
    assert r.is_code == 0
    assert r.n_symbols == 0 and r.kw_hits == 0


def test_symbol_density_alone_insufficient(spark):
    # dense symbols but zero keywords: an equation-ish line, not code
    r = _detect(spark, ["(a < b) = (c > d); {x} (y) = <z>;"])[0]
    assert r.symbol_permille >= 25
    assert r.kw_hits == 0
    assert r.is_code == 0


def test_corpus_plants_both_classes(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = code_detect(spark, SF)
    verdicts = {r.is_code for r in out.select("is_code").distinct().collect()}
    assert verdicts == {0, 1}
    # plant rolls cover both code families and the prose class
    planted = synth_code_docs(docs)
    n_py = planted.filter(planted.text.contains("def compute")).count()
    n_js = planted.filter(planted.text.contains("function render")).count()
    total = docs.count()
    assert 0 < n_py < total and 0 < n_js < total


def test_empty_text_safe(spark):
    r = _detect(spark, [""])[0]
    assert (r.n_symbols, r.kw_hits, r.is_code) == (0, 0, 0)
