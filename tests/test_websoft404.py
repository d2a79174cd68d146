"""Soft-404 / parked-domain gate — semantics beyond the driver's hash
gate: the short-page guard, the two-phrase override, and the parked
battery."""

from __future__ import annotations

from paper2llm_spark.operators.websoft404 import (
    soft404_detect, soft404_frame, synth_dead_docs,
)

SF = "/root/testdata/sf0.001"


def _detect(spark, texts: list[str]):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r for r in soft404_frame(df).collect()}


def test_short_notfound_page_flags(spark):
    r = _detect(spark, ["404 Error - Page Not Found."])[0]
    assert r.nf_hits == 2 and r.is_soft404 == 1


def test_long_article_mentioning_404_survives(spark):
    body = (
        "A deep dive into HTTP semantics. The 404 error code dates "
        "to the earliest web servers. " + "More prose. " * 60
    )
    r = _detect(spark, [body])[0]
    assert r.nf_hits == 1 and r.n_chars >= 600
    assert r.is_soft404 == 0


def test_two_phrases_condemn_any_length(spark):
    body = (
        "Page not found. The resource does not exist. " + "Filler. " * 100
    )
    r = _detect(spark, [body])[0]
    assert r.nf_hits == 2 and r.is_soft404 == 1


def test_parked_page_flags(spark):
    r = _detect(spark, ["this DOMAIN IS FOR SALE right now"])[0]
    assert r.park_hits == 1 and r.is_parked == 1 and r.is_soft404 == 0


def test_corpus_plants_all_classes(spark):
    out = soft404_detect(spark, SF).collect()
    assert {r.is_soft404 for r in out} == {0, 1}
    assert {r.is_parked for r in out} == {0, 1}
    # the append branch (single phrase on a real body) exists too
    assert any(r.nf_hits == 1 for r in out)


def test_plant_is_deterministic(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {r.doc_id: r.text for r in synth_dead_docs(docs).collect()}
    b = {r.doc_id: r.text for r in synth_dead_docs(docs).collect()}
    assert a == b
