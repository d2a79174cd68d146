"""SURT canonicalization + CDX capture index: per-rule canonicalization
replays, revisit collapse, shard-rank contiguity — semantics beyond the
driver's hash gate."""

from __future__ import annotations

from pyspark.sql import functions as F


def _surt(spark, url: str) -> str:
    from paper2llm_spark.operators.webcdx import surt_key

    df = spark.createDataFrame([(url,)], "u string")
    return df.select(surt_key(F.col("u")).alias("s")).collect()[0].s


def test_surt_rules_one_by_one(spark):
    # scheme + case + default port + www + host reversal
    assert _surt(spark, "HTTPS://WWW.Foo.Example.ORG:443/") == \
        "org,example,foo)/"
    # non-default port survives in the host part
    assert _surt(spark, "http://example.org:8080/x") == \
        "org,example:8080)/x"
    # path lowercased, fragment dropped, empty path -> /
    assert _surt(spark, "http://example.org/A/B#frag") == \
        "org,example)/a/b"
    assert _surt(spark, "http://example.org") == "org,example)/"
    # query sorted, session/tracking params dropped
    assert _surt(
        spark,
        "http://example.org/p?z=1&utm_source=x&a=2&jsessionid=abc",
    ) == "org,example)/p?a=2&z=1"
    # all params dropped -> no '?'
    assert _surt(spark, "http://example.org/p?utm_campaign=x") == \
        "org,example)/p"
    # www2. variant stripped too
    assert _surt(spark, "http://www2.example.org/") == "org,example)/"


def test_cdx_revisit_collapse_and_rank(spark):
    """Same content at the same canonical url = ONE entry with capture
    count and earliest ts; different digest = separate entry."""
    from paper2llm_spark.operators.webcdx import cdx_index_frame

    caps = spark.createDataFrame(
        [
            ("http://a.test/x", "20200101000000", "d1"),
            ("HTTP://WWW.A.Test/x#f", "20190101000000", "d1"),
            ("http://a.test/x", "20210101000000", "d2"),
            ("http://b.test/y", "20200101000000", "d3"),
        ],
        "url string, ts string, digest string",
    )
    rows = {(r.surt, r.digest): r for r in cdx_index_frame(caps).collect()}
    assert len(rows) == 3
    r = rows[("test,a)/x", "d1")]
    assert r.n_captures == 2 and r.first_ts == "20190101000000"
    assert rows[("test,a)/x", "d2")].n_captures == 1
    # within a shard, idx_in_shard is the dense lexicographic rank
    by_shard: dict[int, list] = {}
    for r in rows.values():
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: (r.surt, r.digest))
        assert [r.idx_in_shard for r in shard_rows] == list(
            range(1, len(shard_rows) + 1))


def test_cdx_corpus_variants_collapse(spark):
    """Every document's messy/clean url pair collapses to one key —
    any broken canonicalization rule would double the key count."""
    from paper2llm_spark.operators.webcdx import cdx_index

    rows = cdx_index(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    assert all(r.n_captures == 2 for r in rows)
    assert all(r.surt.startswith("org,example,") for r in rows)
    assert all(r.surt.endswith("?a=1&b=2") for r in rows)
    # shards cover the full hash range on 500 keys
    assert len({r.shard for r in rows}) == 16
