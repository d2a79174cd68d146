"""Dedup cluster-size histogram — composition replay against the
cluster assignment and conservation invariants."""

from __future__ import annotations

from paper2llm_spark.operators.dedup import lsh_duplicate_clusters
from paper2llm_spark.operators.webdupstats import MICRO, cluster_stats

SF = "/root/testdata/sf0.001"


def test_histogram_matches_cluster_assignment(spark):
    clusters = lsh_duplicate_clusters(spark, SF).collect()
    sizes: dict[int, int] = {}
    for r in clusters:
        sizes[r.cluster] = sizes.get(r.cluster, 0) + 1
    hist: dict[int, int] = {}
    for s in sizes.values():
        hist[s] = hist.get(s, 0) + 1
    total = len(clusters)
    rows = {r.cluster_size: r for r in cluster_stats(spark, SF).collect()}
    assert {s: r.n_clusters for s, r in rows.items()} == hist
    for s, r in rows.items():
        assert r.n_docs == s * r.n_clusters
        assert r.excess_docs == (s - 1) * r.n_clusters
        assert r.docs_share_micro == s * r.n_clusters * MICRO // total


def test_conservation_and_polarity(spark):
    rows = cluster_stats(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    # the fixture plants real near-dups: multi-doc clusters exist, and
    # singletons still dominate
    assert any(r.cluster_size >= 2 for r in rows)
    singles = next(r for r in rows if r.cluster_size == 1)
    assert singles.n_clusters > sum(
        r.n_clusters for r in rows if r.cluster_size >= 2
    )
    assert singles.excess_docs == 0
