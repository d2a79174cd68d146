"""Canonical-link clustering — semantics beyond the driver's hash
gate: extraction, self-canonical fallback, and survivor choice."""

from __future__ import annotations

from paper2llm_spark.operators.webcanon import (
    canonical_clusters, canonical_clusters_frame,
)

SF = "/root/testdata/sf0.001"


def _clusters(spark, pages: list[tuple[str, str]]):
    df = spark.createDataFrame(pages, "url string, page string")
    return {r.canonical: r for r in canonical_clusters_frame(df).collect()}


def test_declared_pages_cluster(spark):
    tag = '<link rel="canonical" href="https://c.test/one">'
    rows = _clusters(spark, [
        ("https://a.test/1", f"<html><head>{tag}</head></html>"),
        ("https://b.test/2", f"<html><head>{tag}</head></html>"),
        ("https://a.test/3", "<html><head></head></html>"),
    ])
    c = rows["https://c.test/one"]
    assert c.n_pages == 2 and c.n_declared == 2
    assert c.keep_url == "https://a.test/1"  # lexicographic min survivor
    s = rows["https://a.test/3"]
    assert (s.n_pages, s.n_declared, s.keep_url) == (
        1, 0, "https://a.test/3")


def test_case_insensitive_and_first_match(spark):
    page = (
        '<html><head><LINK REL="canonical" HREF="https://c.test/x">'
        '<link rel="canonical" href="https://c.test/y"></head></html>'
    )
    rows = _clusters(spark, [("https://a.test/1", page)])
    assert list(rows) == ["https://c.test/x"]  # first declaration wins


def test_corpus_builds_multi_page_clusters(spark):
    out = canonical_clusters(spark, SF).collect()
    sizes = {r.n_pages for r in out}
    assert max(sizes) >= 2  # the div-4 plant builds real clusters
    for r in out:
        assert r.n_declared <= r.n_pages
        if r.canonical.startswith("https://canon.test/"):
            assert r.n_declared == r.n_pages  # shared targets: all declared
        else:
            assert r.n_pages == 1 and r.n_declared == 0  # self-canonical
