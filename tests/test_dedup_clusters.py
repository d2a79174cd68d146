"""Connected-components + LSH duplicate-cluster resolution.

The driver's `dedup_lsh_clusters` row checks the full operator against a
DuckDB recursive-CTE oracle at sf0.01; these tests pin the pieces the
fixture graph cannot exercise: multi-hop convergence (the sf corpus dup
clusters are dense, diameter ~1) and the keep/drop contract.
"""

from __future__ import annotations


def _cc(spark, pairs):
    from paper2llm_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = connected_components(edges).collect()
    return {r["node"]: r["cluster"] for r in got}


def test_chain_graph_needs_multiple_hops(spark):
    # 0-1-2-3-4-5: min label must walk 5 hops; catches any
    # one-iteration implementation
    labels = _cc(spark, [(i, i + 1) for i in range(5)])
    assert labels == {i: 0 for i in range(6)}


def test_long_chain_converges_within_round_cap(spark):
    # 120-node path graph: pure one-hop propagation needs 119 rounds
    # and would trip the CC_MAX_ITERS=20 guard; passing proves the
    # pointer-doubling shortcut gives O(log diameter) convergence
    n = 120
    labels = _cc(spark, [(i, i + 1) for i in range(n - 1)])
    assert labels == {i: 0 for i in range(n)}


def test_two_components_and_unsorted_edges(spark):
    labels = _cc(spark, [(7, 3), (3, 9), (20, 11)])
    assert labels == {3: 3, 7: 3, 9: 3, 11: 11, 20: 11}


def test_clusters_keep_exactly_one_canonical_per_cluster(spark):
    from pyspark.sql import functions as F

    from paper2llm_spark.operators.dedup import lsh_duplicate_clusters

    out = lsh_duplicate_clusters(spark, "/root/testdata/sf0.001")
    rows = out.groupBy("cluster").agg(
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.min("doc_id").alias("min_doc"),
        F.first("cluster").alias("c"),
    ).collect()
    assert rows  # corpus is non-empty
    for r in rows:
        assert r["n_keep"] == 1  # exactly one representative
        assert r["min_doc"] == r["c"]  # and it's the min doc_id
