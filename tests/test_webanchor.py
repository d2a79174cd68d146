"""Semantic tests for anchor-text aggregation per target host.

Cross-engine equality vs DuckDB is covered by test_driver_contract.py;
these pin semantics on crafted pages where the right answer is known
by hand.
"""

from __future__ import annotations

from paper2llm_spark.operators.webanchor import (
    ANCHOR_TOP_K,
    anchor_terms_frame,
)


def _pages(spark, htmls):
    return spark.createDataFrame(
        [(f"https://s.test/{i}", h) for i, h in enumerate(htmls)],
        "url string, html binary",
    )


def test_anchor_terms_counts_and_rank(spark):
    htmls = [
        b'<html><a href="https://a.test/x">deep learning</a>'
        b"<a class='m' HREF='https://a.test/y'>deep nets</a>"
        b'<a href="https://b.test/z">shallow ponds</a></html>',
        b'<html><a rel="x" href="https://a.test/w">deep dive</a></html>',
    ]
    rows = [r.asDict() for r in anchor_terms_frame(_pages(spark, htmls)).collect()]
    a = sorted(
        [(r["rank"], r["term"], r["n_mentions"]) for r in rows
         if r["dst_host"] == "a.test"]
    )
    # "deep" x3 wins; dive/learning/nets tie at 1, broken by term asc
    assert a == [(1, "deep", 3), (2, "dive", 1), (3, "learning", 1),
                 (4, "nets", 1)]
    b = [(r["rank"], r["term"]) for r in rows if r["dst_host"] == "b.test"]
    assert sorted(b) == [(1, "ponds"), (2, "shallow")]


def test_anchor_terms_top_k_truncates(spark):
    body = "".join(
        f'<a href="https://t.test/{i}">term{i:02d}</a>' for i in range(9)
    )
    rows = anchor_terms_frame(
        _pages(spark, [f"<html>{body}</html>".encode()])
    ).collect()
    assert len(rows) == ANCHOR_TOP_K
    # all tie at 1 mention -> lexicographic term order decides
    assert [r["term"] for r in sorted(rows, key=lambda r: r["rank"])] == [
        f"term{i:02d}" for i in range(ANCHOR_TOP_K)
    ]


def test_anchor_empty_and_no_href_ignored(spark):
    htmls = [b'<html><a name="x">skipped</a><p>no anchors</p></html>']
    assert anchor_terms_frame(_pages(spark, htmls)).collect() == []
