"""Web-mining batch — structured data, CCAligned, hreflang clusters,
title spam, DOM depth, AMP pairs: hand-built pages, every polarity."""

from __future__ import annotations

from paper2llm_spark.operators.webamp import amp_pairs_frame
from paper2llm_spark.operators.webccalign import ccaligned_frame
from paper2llm_spark.operators.webdomdepth import dom_depth_frame
from paper2llm_spark.operators.webhreflang import hreflang_frame
from paper2llm_spark.operators.webtitlespam import title_spam_frame
from paper2llm_spark.operators.webwdc import structured_frame


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode()) for u, h in rows], "url string, html binary"
    )


def test_structured_data_extraction(spark):
    rows = [
        ("u1", '<html><head><script type="application/ld+json">'
               '{"@type": "Article"}</script></head>'
               '<body><div itemscope itemtype="https://schema.org/WebPage">'
               'x</div></body></html>'),
        ("u2", "<html><head></head><body><div>x</div></body></html>"),
        ("u3", '<html><head><script type="application/ld+json">'
               "{'@type': 'Recipe'}</script>"
               '<script type="application/ld+json">{"@type": "Product"}'
               "</script></head><body>x</body></html>"),
    ]
    got = {r.url: (r.n_ldjson, r.first_type, r.has_microdata)
           for r in structured_frame(_pages(spark, rows)).collect()}
    assert got["u1"] == (1, "Article", True)
    assert got["u2"] == (0, "", False)
    assert got["u3"] == (2, "Recipe", False)  # first block wins


def test_ccaligned_path_and_query_forms_share_key(spark):
    rows = [
        ("https://s.test/en/p1", "en"),
        ("https://s.test/p1?lang=fr", "fr"),   # query form, same key
        ("https://s.test/de/p1", "de"),
        ("https://s.test/fr/p2", "fr"),        # no English member
    ]
    df = spark.createDataFrame(rows, "url string, lang string")
    got = {(r.url_xx, r.lang): r.url_en for r in ccaligned_frame(df).collect()}
    assert got == {
        ("https://s.test/p1?lang=fr", "fr"): "https://s.test/en/p1",
        ("https://s.test/de/p1", "de"): "https://s.test/en/p1",
    }


def test_hreflang_chain_clusters_transitively(spark):
    # a -> b, b -> c declared only (chain); d declares nothing
    link = '<link rel="alternate" hreflang="xx" href="%s">'
    rows = [
        ("a", "<html><head>" + link % "b" + "</head></html>"),
        ("b", "<html><head>" + link % "c" + "</head></html>"),
        ("c", "<html><head></head></html>"),
        ("d", "<html><head></head></html>"),
    ]
    got = {r.url: (r.cluster, r.n_members)
           for r in hreflang_frame(_pages(spark, rows)).collect()}
    assert got["a"] == ("a", 3) and got["b"] == ("a", 3) and got["c"] == ("a", 3)
    assert got["d"] == ("d", 1)


def test_title_spam_coherent_vs_stuffed(spark):
    rows = [
        ("ok", "<html><head><title>alpha beta</title></head>"
               "<body>alpha beta gamma delta</body></html>"),
        ("spam", "<html><head><title>buy cheap deal</title></head>"
                 "<body>alpha beta gamma delta</body></html>"),
        ("caps", "<html><head><title>ALPHA BETA</title></head>"
                 "<body>alpha beta</body></html>"),
    ]
    got = {r.url: r.asDict()
           for r in title_spam_frame(_pages(spark, rows)).collect()}
    assert got["ok"]["overlap_micro"] == 1_000_000
    assert got["ok"]["title_spam"] is False
    assert got["spam"]["overlap_micro"] == 0
    assert got["spam"]["title_spam"] is True
    assert got["caps"]["caps_micro"] == 1_000_000
    # case-folded tokens still overlap
    assert got["caps"]["overlap_micro"] == 1_000_000


def test_dom_depth_nesting_void_and_imbalance(spark):
    rows = [
        ("flat", "<html><body>x<br>y</body></html>"),
        ("deep", "<html><body><div><div><div>x</div></div></div>"
                 "</body></html>"),
        ("open", "<html><body><section>x</body></html>"),
    ]
    got = {r.url: (r.max_depth, r.final_depth, r.n_tags)
           for r in dom_depth_frame(_pages(spark, rows)).collect()}
    assert got["flat"] == (2, 0, 4)    # html, body; <br> excluded
    assert got["deep"] == (5, 0, 10)
    assert got["open"] == (3, 1, 5)    # section never closes


def test_amp_pairs_reciprocity(spark):
    amp_link = '<link rel="amphtml" href="%s">'
    canon_link = '<link rel="canonical" href="%s">'
    rows = [
        ("c1", "<html><head>" + amp_link % "c1/amp" + "</head></html>"),
        ("c1/amp", "<html><head>" + canon_link % "c1" + "</head></html>"),
        ("c2", "<html><head>" + amp_link % "c2/amp" + "</head></html>"),
        ("c2/amp", "<html><head></head></html>"),       # no backlink
        ("c3", "<html><head></head></html>"),           # no declaration
        ("c3/amp", "<html><head>" + canon_link % "c3" + "</head></html>"),
    ]
    got = {(r.canonical_url, r.amp_url): r.reciprocal
           for r in amp_pairs_frame(_pages(spark, rows)).collect()}
    assert got == {("c1", "c1/amp"): True, ("c2", "c2/amp"): False}
