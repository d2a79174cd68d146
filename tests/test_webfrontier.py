"""Crawl frontier — semantics beyond the driver's hash gate: host
co-location, politeness spacing, priority order, queue contiguity."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _frontier(spark):
    from paper2llm_spark.operators.webfrontier import crawl_frontier

    return crawl_frontier(spark, SF)


def test_host_maps_to_exactly_one_shard(spark):
    out = _frontier(spark)
    assert out.groupBy("host").agg(
        F.countDistinct("shard").alias("n")
    ).filter(F.col("n") > 1).count() == 0


def test_fetch_seq_contiguous_per_shard(spark):
    rows = _frontier(spark).groupBy("shard").agg(
        F.count("*").alias("n"), F.min("fetch_seq").alias("mn"),
        F.max("fetch_seq").alias("mx"),
        F.countDistinct("fetch_seq").alias("d"),
    ).collect()
    assert rows
    for r in rows:
        assert r["mn"] == 1 and r["mx"] == r["n"] == r["d"]


def test_priority_order_within_host(spark):
    """Higher-priority (longer) pages fetch earlier within their host."""
    out = _frontier(spark).join(
        _frontier(spark).groupBy("host").count(), "host"
    )
    docs = out.sparkSession.read.parquet(f"{SF}/documents.parquet").select(
        F.concat(F.lit("https://"), "source", F.lit(".test/"),
                 "doc_id").alias("url"),
        "n_chars", "doc_id",
    )
    j = out.join(docs, "url").collect()
    by_host: dict[str, list] = {}
    for r in j:
        by_host.setdefault(r["host"], []).append(r)
    for h, rs in by_host.items():
        rs = sorted(rs, key=lambda r: r["seq_in_host"])
        keys = [(-r["n_chars"], r["doc_id"]) for r in rs]
        assert keys == sorted(keys), h


def test_politeness_interleaving(spark):
    """Within a shard, between two consecutive fetches of the same host
    every OTHER host of that shard with work remaining is fetched —
    i.e. the queue is wave-ordered (seq_in_host is non-decreasing in
    fetch_seq)."""
    rows = _frontier(spark).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for s, rs in by_shard.items():
        rs = sorted(rs, key=lambda r: r["fetch_seq"])
        waves = [r["seq_in_host"] for r in rs]
        assert waves == sorted(waves), s
        # same-host gap: at least (hosts in wave) - 1 rows apart when
        # multiple hosts are active in the wave
        last_ix = {}
        for ix, r in enumerate(rs):
            if r["host"] in last_ix:
                assert ix - last_ix[r["host"]] >= 1
            last_ix[r["host"]] = ix
