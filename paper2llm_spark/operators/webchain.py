"""Dedup chaining audit — transitivity strictness of the LSH
clusters (the classic dedup-ops failure mode: connected components
glue A-B and B-C into one cluster even when A-C never verified —
"chaining" per the record-linkage literature, Monge & Elkan 1997;
Lee et al. 2022 §4 discuss exactly this cluster-granularity
choice).  Before a keep-one-per-cluster pass deletes documents, a
release team reads this table: how many clusters are glued by
transitivity rather than pairwise-verified similarity?

Composes BOTH registered stages verbatim — `dedup_lsh_clusters`
(built from candidate pairs + connected components) and
`dedup_lsh_verified` (the est-Jaccard-filtered pairs) — and checks
one against the other under a single driver hash.

Semantics (frozen): per multi-doc cluster: ``size``,
``n_possible = size*(size-1)/2``, ``n_verified`` — within-cluster
pairs that survived signature verification, ``min_est4`` — the
weakest surviving link (0.0 when none survived), ``chained`` —
``n_verified < n_possible`` (the cluster relies on transitivity).

Plan shape (the scale story): cluster membership is the composed
operator's output; within-cluster pair enumeration is a self-join
keyed on cluster — fanout bounded by LSH-band-capped cluster sizes
(the composed operator's own documented bound); verified pairs
re-enter by broadcast of the dup-graph-bounded pair list.  Zero
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    LSH_CLUSTERS_SQL, LSH_VERIFIED_SQL, lsh_duplicate_clusters,
    lsh_verified_pairs,
)

MICRO = 1_000_000


def chain_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    members = lsh_duplicate_clusters(spark, sf_dir).select(
        "cluster", "doc_id"
    )
    sizes = members.groupBy("cluster").agg(
        F.count("*").cast("bigint").alias("size")
    ).filter(F.col("size") >= 2)
    multi = members.join(F.broadcast(sizes), "cluster")
    a, b = multi.alias("a"), multi.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.cluster").alias("cluster"),
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
    )
    verified = lsh_verified_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", "est_jaccard"
    )
    marked = pairs.join(F.broadcast(verified), ["doc_a", "doc_b"], "left")
    per_cluster = marked.groupBy("cluster").agg(
        F.sum(F.expr("if(est_jaccard is not null, 1, 0)"))
        .cast("bigint").alias("n_verified"),
        F.min("est_jaccard").alias("min_est"),
    )
    return (
        sizes.join(per_cluster, "cluster")
        .select(
            "cluster",
            "size",
            F.expr("size * (size - 1) div 2").cast("bigint")
            .alias("n_possible"),
            "n_verified",
            F.coalesce("min_est", F.lit(0.0)).alias("min_est4"),
            F.expr("n_verified < size * (size - 1) div 2")
            .alias("chained"),
        )
    )


CHAIN_AUDIT_SQL = f"""
WITH members AS (SELECT cluster, doc_id FROM ({LSH_CLUSTERS_SQL})),
sizes AS (
  SELECT cluster, count(*)::BIGINT AS size
  FROM members GROUP BY 1 HAVING count(*) >= 2
),
pairs AS (
  SELECT a.cluster, a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM members a
  JOIN members b ON b.cluster = a.cluster AND a.doc_id < b.doc_id
  JOIN sizes s ON s.cluster = a.cluster
),
verified AS (SELECT doc_a, doc_b, est_jaccard FROM ({LSH_VERIFIED_SQL})),
marked AS (
  SELECT p.cluster,
         CASE WHEN v.est_jaccard IS NOT NULL THEN 1 ELSE 0 END AS ok,
         v.est_jaccard
  FROM pairs p
  LEFT JOIN verified v ON v.doc_a = p.doc_a AND v.doc_b = p.doc_b
),
per_cluster AS (
  SELECT cluster, sum(ok)::BIGINT AS n_verified,
         min(est_jaccard) AS min_est
  FROM marked GROUP BY 1
)
SELECT s.cluster, s.size,
       (s.size * (s.size - 1) // 2)::BIGINT AS n_possible,
       p.n_verified,
       coalesce(p.min_est, 0.0) AS min_est4,
       p.n_verified < s.size * (s.size - 1) // 2 AS chained
FROM sizes s JOIN per_cluster p USING (cluster)
"""


QUERIES: dict[str, tuple] = {
    "dedup_chain_audit": (chain_audit, CHAIN_AUDIT_SQL),
}
