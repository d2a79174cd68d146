"""Quality-based canonical selection for near-duplicate clusters —
the keep/drop policy production dedup actually applies.  MinHash/LSH
clustering answers "which documents are the same"; this operator
answers "which copy do we keep": per cluster, retain the LONGEST
member (``n_chars`` desc, ``doc_id`` asc tiebreak), the
RefinedWeb/FineWeb policy (the longest near-duplicate is usually the
un-truncated, un-paywalled capture; min-id keeps whichever URL was
crawled first, which is arbitrary).

Composition, not new machinery: clusters come from
`dedup.lsh_duplicate_clusters` (banded MinHash candidate pairs ->
pointer-doubling connected components); this operator joins back the
per-document length and runs ONE ``row_number`` window per cluster.

Plan shape (the scale story): the window partitions by ``cluster`` —
the dup-graph-bounded table, orders of magnitude smaller than the
corpus for real near-dup rates; singleton clusters (the vast
majority) pass through the same window at one row each.  The length
join is a shuffle on ``doc_id`` (broadcast when the dup graph is small
relative to the corpus, the common case).  Cluster sizes are bounded
by the LSH band structure upstream, so no window partition can be
corpus-sized.

Output per document: its cluster, whether it is kept, and the cluster
size (1 for non-duplicates — every kept singleton is its own
canonical).

Reference scope anchor: beyond-reference web-scale operator (dedup
tier); the policy layer over `dedup_lsh_clusters` (which certifies the
min-id variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .dedup import LSH_CLUSTERS_SQL, lsh_duplicate_clusters


def keep_best_frame(clusters: DataFrame, docs: DataFrame) -> DataFrame:
    sized = clusters.select("doc_id", "cluster").join(
        docs.select("doc_id", "n_chars"), "doc_id"
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc())
    return sized.select(
        "doc_id", "cluster", "n_chars",
        (F.row_number().over(w) == 1).alias("keep"),
        F.count("*").over(Window.partitionBy("cluster"))
        .cast("bigint").alias("cluster_size"),
    )


def keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return keep_best_frame(
        lsh_duplicate_clusters(spark, sf_dir), docs)


# LSH_CLUSTERS_SQL is a complete WITH RECURSIVE ... SELECT statement;
# nest it as a derived table (DuckDB allows a recursive WITH inside a
# subquery) and layer the policy window on top.
KEEP_BEST_SQL = f"""
WITH base AS ({LSH_CLUSTERS_SQL}),
sized AS (
  SELECT b.doc_id, b.cluster, d.n_chars
  FROM base b JOIN documents d USING (doc_id)
)
SELECT doc_id, cluster, n_chars,
       (row_number() OVER (PARTITION BY cluster
            ORDER BY n_chars DESC, doc_id ASC) = 1) AS keep,
       count(*) OVER (PARTITION BY cluster)::BIGINT AS cluster_size
FROM sized
"""


QUERIES: dict[str, tuple] = {
    "dedup_cluster_keep_best": (keep_best, KEEP_BEST_SQL),
}
