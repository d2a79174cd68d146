"""Site-template line detection — threshold semantics beyond the
driver's hash gate: the >=2-pages floor, the half-of-host ratio, and
within-page distinct counting."""

from __future__ import annotations

from paper2llm_spark.operators.webtemplate import (
    template_lines, template_lines_frame,
)

SF = "/root/testdata/sf0.001"


def _frame(spark, rows):
    df = spark.createDataFrame(rows, "host string, url string, text string")
    out = template_lines_frame(df).collect()
    return {(r.host, r.line): (r.n_pages, r.host_pages) for r in out}


def test_threshold_both_directions(spark):
    rows = [
        ("a", "a/1", "nav\npromo\nunique one"),
        ("a", "a/2", "nav\npromo\nunique two"),
        ("a", "a/3", "nav\nunique three"),
        ("a", "a/4", "nav\nunique four"),
        ("b", "b/1", "nav\npromo\nalpha"),
        ("b", "b/2", "nav\nbeta"),
        ("b", "b/3", "nav\ngamma"),
    ]
    out = _frame(spark, rows)
    assert out[("a", "nav")] == (4, 4)
    # promo on 2 of 4 pages: 2*2 >= 4 -> template
    assert out[("a", "promo")] == (2, 4)
    # promo on 1 of 3 pages of b: below the >=2 floor
    assert ("b", "promo") not in out
    assert ("a", "unique one") not in out
    assert out[("b", "nav")] == (3, 3)


def test_within_page_repeats_count_once(spark):
    rows = [
        ("h", "h/1", "nav\nnav\nnav\nx"),
        ("h", "h/2", "nav\ny"),
        ("h", "h/3", "z"),
    ]
    out = _frame(spark, rows)
    # nav on 2 distinct pages (triple repeat on page 1 counts once);
    # 2*2 >= 3 -> template
    assert out[("h", "nav")] == (2, 3)


def test_corpus_plants_nav_on_every_host(spark):
    out = template_lines(spark, SF).collect()
    navs = [r for r in out if r.line.startswith("NAV ")]
    # 5 sources x 4 host shards
    assert len(navs) == 20
    assert all(r.n_pages == r.host_pages for r in navs)
