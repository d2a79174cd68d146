"""Sitemap ingestion — semantics beyond the driver's hash gate:
field extraction on handcrafted XML, the spec's defaulting and
same-host rules."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _parse(spark, rows):
    from paper2llm_spark.operators.websitemap import sitemap_urls_frame

    df = spark.createDataFrame(
        rows, "doc_id long, host string, sitemap_xml string"
    )
    return [
        (r["url"], r["lastmod"], r["priority_milli"], r["same_host"])
        for r in sitemap_urls_frame(df).orderBy("url").collect()
    ]


def test_field_extraction_defaulting_and_host_rule(spark):
    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://h.test/a</loc><lastmod>2026-03-01</lastmod>"
        "<priority>0.8</priority></url>"
        "<url><loc>https://h.test/b</loc></url>"
        "<url><loc>https://other.test/c</loc><priority>0.2</priority></url>"
        "</urlset>"
    )
    got = _parse(spark, [(0, "h.test", xml)])
    assert got == [
        ("https://h.test/a", "2026-03-01", 800, True),
        ("https://h.test/b", None, 500, True),       # spec default 0.5
        ("https://other.test/c", None, 200, False),  # cross-host flagged
    ]


def test_empty_and_entryless_sitemaps(spark):
    got = _parse(spark, [
        (0, "h.test", '<?xml version="1.0"?><urlset></urlset>'),
        (1, "h.test", "not xml at all"),
    ])
    assert got == []


def test_corpus_shape(spark):
    from paper2llm_spark.operators.websitemap import sitemap_urls

    out = sitemap_urls(spark, SF).cache()
    try:
        rows = out.collect()
        # 2 same-host per file + 1 cross-host per 4th file
        assert len(rows) == 500 * 2 + 125
        assert sum(not r["same_host"] for r in rows) == 125
        assert all(
            (not r["same_host"]) == r["url"].startswith("https://evil.")
            for r in rows
        )
        # every attributed entry parsed; minimal entries defaulted
        assert sum(r["lastmod"] is not None for r in rows) == 500
        assert {r["priority_milli"] for r in rows} == (
            {100 * i for i in range(10)} | {500}
        )
    finally:
        out.unpersist()
