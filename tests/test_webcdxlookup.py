"""CDX lookup: canonicalization round-trip at lookup time, hit/miss
polarity, revisit aggregation — semantics beyond the driver's hash gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from paper2llm_spark.operators.webcdx import cdx_index_frame
from paper2llm_spark.operators.webcdxlookup import cdx_lookup_frame


def _lookup(spark, captures, queries):
    caps = spark.createDataFrame(
        captures, "url string, ts string, digest string")
    q = spark.createDataFrame([(u,) for u in queries],
                              "query_url string")
    idx = cdx_index_frame(caps)
    return {r.query_url: r
            for r in cdx_lookup_frame(q, idx).collect()}


def test_lookup_canonicalization_roundtrip(spark):
    """A query url that was never captured byte-for-byte still hits iff
    it canonicalizes to the captured SURT."""
    rows = _lookup(
        spark,
        [("http://a.test/x?p=1", "20200101000000", "d1"),
         ("http://a.test/x?p=1", "20210101000000", "d1"),
         ("http://a.test/x?p=1", "20190101000000", "d2")],
        ["HTTPS://WWW.A.Test:443/X?utm_source=z&p=1#frag",
         "http://a.test/y?p=1"],
    )
    hit = rows["HTTPS://WWW.A.Test:443/X?utm_source=z&p=1#frag"]
    assert hit.hit == 1
    assert hit.n_entries == 2        # d1 (revisit-collapsed) + d2
    assert hit.n_captures == 3       # two d1 captures + one d2
    assert hit.earliest_ts == "20190101000000"
    miss = rows["http://a.test/y?p=1"]
    assert miss.hit == 0 and miss.n_entries == 0
    assert miss.earliest_ts is None


def test_corpus_lookup_polarity(spark):
    from paper2llm_spark.operators.webcdxlookup import (
        MISS_EVERY, QUERY_EVERY, cdx_lookup,
    )

    rows = cdx_lookup(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    hits = [r for r in rows if r.hit == 1]
    misses = [r for r in rows if r.hit == 0]
    assert hits and misses
    # hit queries matched the doc's two url variants -> one collapsed
    # entry per digest with both captures counted
    for r in hits:
        assert r.n_captures == 2 * r.n_entries
    for r in misses:
        assert "/missing/" in r.query_url.lower() or r.n_entries == 0
