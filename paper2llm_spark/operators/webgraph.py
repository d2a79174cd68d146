"""Web-graph centrality over the corpus link graph (SURVEY.md §2.11).

Common-Crawl-scale curation ranks hosts/pages by link centrality
(OPIC / harmonic / PageRank are the published CC rankings) and uses
the score as a crawl-priority and quality prior.  The driver corpus
has no link column, so the registered query derives a deterministic
synthetic graph *in-engine* — each document links to ``PR_OUT_K``
pseudo-random targets chosen by the portable 60-bit hash, the same
templated-corpus technique the flagship oracle uses — and both engines
build byte-identical edge lists from ``documents.doc_id`` alone.

The iteration is the classic distributed PageRank shape, with the plan
that survives 10^12 nodes:

* the edge list is materialized ONCE (``localCheckpoint``) with its
  out-degree attached — per-iteration lineage is two narrow columns,
  never a re-derivation of the graph;
* each round shuffles only ``(dst, bigint)`` contribution rows through
  one map-side-combinable ``groupBy`` — rank state never carries text
  or edge payloads;
* ranks travel as exact bigint micro-units with integer division
  (``rank div deg``, ``(85 * s) div 100``), so results are independent
  of float summation order across partitions AND bit-identical to the
  DuckDB dual's unrolled-CTE rounds — float PageRank can never
  hash-match across engines;
* dangling/unlinked nodes re-enter every round via a left join against
  the node list (they hold the 0.15 base mass).

At real scale the edge list is a bucketed table partitioned by ``src``
so the per-round join is co-located, and iterations stop on an L1
residual; the fixed ``PR_ITERS`` here keeps the DuckDB dual a finite
CTE unroll.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

PR_OUT_K = 3      # synthetic out-links per node
PR_ITERS = 3      # fixed Lloyd-style unroll so the dual is finite CTEs
PR_BASE = 150_000          # 0.15 in micro-units
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # 0.85 as an exact ratio
PR_INIT = 1_000_000        # initial rank, micro-units


def _nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # id-only scan; first real step is an exchange, so no spread
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")


def synth_edges(nodes: DataFrame, n_nodes: int) -> DataFrame:
    """Deterministic (src, dst) edges: ``PR_OUT_K`` hash-chosen targets
    per node, self-loops dropped, duplicates collapsed."""
    ks = F.array(*[F.lit(k) for k in range(PR_OUT_K)])
    return (
        nodes.select(F.col("doc_id").alias("src"), F.explode(ks).alias("k"))
        .select(
            "src",
            (
                portable_hash60(
                    F.concat(
                        F.col("src").cast("string"),
                        F.lit(":"),
                        F.col("k").cast("string"),
                    )
                )
                % n_nodes
            ).alias("dst"),
        )
        .filter(F.col("dst") != F.col("src"))
        .distinct()
    )


def pagerank_frame(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """``PR_ITERS`` exact-integer PageRank rounds over (nodes, edges)."""
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ed = edges.join(deg, "src").localCheckpoint()
    ranks = nodes.select(
        "doc_id", F.lit(PR_INIT).cast("bigint").alias("rank_micro")
    )
    for _ in range(PR_ITERS):
        contrib = ed.join(
            ranks.withColumnRenamed("doc_id", "src"), "src"
        ).select("dst", F.expr("rank_micro div deg").alias("c"))
        sums = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .withColumnRenamed("dst", "doc_id")
        )
        ranks = (
            nodes.join(sums, "doc_id", "left")
            .select(
                "doc_id",
                (
                    F.lit(PR_BASE)
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(s, 0)) div {PR_DAMP_DEN}"
                    )
                )
                .cast("bigint")
                .alias("rank_micro"),
            )
        )
    return ranks


def pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = _nodes(spark, sf_dir)
    n = nodes.count()
    return pagerank_frame(nodes, synth_edges(nodes, n))


def _pagerank_sql() -> str:
    h = sql_hash60("src || ':' || k")
    ks = ", ".join(f"({k})" for k in range(PR_OUT_K))
    ctes = [
        f"""n AS (SELECT count(*) AS n FROM documents),
e0 AS (SELECT doc_id AS src, ({h}) % n.n AS dst
       FROM documents, n, (VALUES {ks}) t(k)),
e AS (SELECT DISTINCT src, dst FROM e0 WHERE dst <> src),
deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
r0 AS (SELECT doc_id, {PR_INIT}::BIGINT AS rank_micro FROM documents)"""
    ]
    for i in range(1, PR_ITERS + 1):
        ctes.append(
            f"""c{i} AS (SELECT e.dst, sum(r.rank_micro // d.deg) AS s
       FROM e JOIN deg d USING (src)
       JOIN r{i - 1} r ON r.doc_id = e.src GROUP BY 1),
r{i} AS (SELECT d.doc_id,
              ({PR_BASE} + ({PR_DAMP_NUM} * coalesce(c{i}.s, 0))
                           // {PR_DAMP_DEN})::BIGINT AS rank_micro
       FROM documents d LEFT JOIN c{i} ON c{i}.dst = d.doc_id)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT doc_id, rank_micro FROM r{PR_ITERS}"
    )


PAGERANK_SQL = _pagerank_sql()


QUERIES: dict[str, tuple] = {
    "web_pagerank": (pagerank, PAGERANK_SQL),
}
