"""Semantic tests for robots.txt compliance filtering (RFC 9309:
longest prefix wins, Allow beats Disallow on ties, no match allows)."""

from __future__ import annotations

from paper2llm_spark.operators.webrobots import robots_filter_frame


def _run(spark, urls, rules):
    pages = spark.createDataFrame([(u,) for u in urls], "url string")
    rdf = spark.createDataFrame(
        rules, "host string, path_prefix string, allow boolean"
    )
    return {
        r["url"]: (r["matched_prefix"], r["allowed"])
        for r in robots_filter_frame(pages, rdf).collect()
    }


def test_longest_match_shadows_shorter(spark):
    out = _run(
        spark,
        ["https://a.test/private/ok/1", "https://a.test/private/no/2"],
        [
            ("a.test", "/private", False),
            ("a.test", "/private/ok", True),
        ],
    )
    # 2-segment Allow shadows the 1-segment Disallow
    assert out["https://a.test/private/ok/1"] == ("/private/ok", True)
    assert out["https://a.test/private/no/2"] == ("/private", False)


def test_allow_wins_equal_length_tie(spark):
    out = _run(
        spark,
        ["https://a.test/blog/x/1"],
        [("a.test", "/blog", False), ("a.test", "/blog", True)],
    )
    assert out["https://a.test/blog/x/1"] == ("/blog", True)


def test_no_match_is_allowed_and_hosts_isolated(spark):
    out = _run(
        spark,
        ["https://a.test/other/x/1", "https://b.test/private/x/2"],
        [("a.test", "/private", False)],
    )
    assert out["https://a.test/other/x/1"] == ("", True)
    # b.test has no rules; a.test's Disallow must not leak
    assert out["https://b.test/private/x/2"] == ("", True)
