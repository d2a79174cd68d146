"""Duplicate-cluster size histogram — the dedup datasheet table
(Lee et al. ACL 2022 "Deduplicating Training Data..." Fig. 1 is
this histogram; every corpus card reports "X% of documents sit in
clusters of size >= 2, largest cluster Y").  Turns the LSH cluster
assignment into the release-note numbers: how much of the corpus is
duplicated, at what cluster granularity, and how much a
keep-one-per-cluster pass would remove.

Composes `dedup_lsh_clusters` verbatim — the MinHash -> banded LSH
-> verified pairs -> connected components chain is transitively
re-certified under this query's driver row.

Semantics (frozen): per distinct cluster size ``s`` (singletons
included — the honest denominator):

* ``n_clusters`` — clusters of exactly that size
* ``n_docs = s * n_clusters``
* ``excess_docs = (s - 1) * n_clusters`` — what keep-best removes
* ``docs_share_micro = n_docs * 1e6 div corpus_total``

All exact bigints.

Plan shape (the scale story): two map-side-combinable collapses on
top of the cluster frame — ``groupBy(cluster)`` (corpus -> one row
per cluster of 2 bigints) then ``groupBy(size)`` (clusters -> at
most |distinct sizes| rows); the corpus total re-enters as a 1-row
broadcast.  The expensive work (signatures, banding, components)
is the composed operator's own, already plan-asserted; this audit
adds two short-row exchanges and nothing Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import LSH_CLUSTERS_SQL, lsh_duplicate_clusters

MICRO = 1_000_000


def cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    clusters = lsh_duplicate_clusters(spark, sf_dir)
    sizes = clusters.groupBy("cluster").agg(
        F.count("*").cast("bigint").alias("s")
    )
    total = clusters.agg(F.count("*").cast("bigint").alias("t"))
    return (
        sizes.groupBy("s")
        .agg(F.count("*").cast("bigint").alias("n_clusters"))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("s").alias("cluster_size"),
            "n_clusters",
            F.expr("s * n_clusters").cast("bigint").alias("n_docs"),
            F.expr("(s - 1) * n_clusters").cast("bigint")
            .alias("excess_docs"),
            F.expr(f"s * n_clusters * {MICRO} div t").cast("bigint")
            .alias("docs_share_micro"),
        )
    )


CLUSTER_STATS_SQL = f"""
WITH clusters AS ({LSH_CLUSTERS_SQL}),
sizes AS (SELECT cluster, count(*)::BIGINT AS s FROM clusters GROUP BY 1),
total AS (SELECT count(*)::BIGINT AS t FROM clusters)
SELECT s AS cluster_size,
       count(*)::BIGINT AS n_clusters,
       (s * count(*))::BIGINT AS n_docs,
       ((s - 1) * count(*))::BIGINT AS excess_docs,
       (s * count(*) * {MICRO} // max(t))::BIGINT AS docs_share_micro
FROM sizes, total
GROUP BY s, t
"""


QUERIES: dict[str, tuple] = {
    "dedup_cluster_stats": (cluster_stats, CLUSTER_STATS_SQL),
}
