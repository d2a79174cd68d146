"""Label-propagation community detection (Raghavan, Albert & Kumara,
Phys. Rev. E 2007) — the near-linear-time community algorithm
GraphFrames/GraphX ship as `labelPropagation`, and the standard way a
crawl pipeline groups hosts/pages into link neighborhoods (mirror
farms, link rings, topical clusters) without choosing k.

Semantics (frozen, fully deterministic): synchronous LPA.  Labels
start as the node id; each round every node adopts the label that is
most frequent among its neighbors, ties broken by the SMALLEST label
(the paper leaves tie-breaks random — frozen to min for cross-engine
determinism); isolated nodes keep their label.  Exactly ``LPA_ITERS =
3`` rounds: the paper's own caveat that synchronous updates can
oscillate on bipartite-ish structures is answered with a fixed round
cap, not asynchrony (asynchrony is order-dependent and would never be
engine-reproducible).  The graph is the deterministic hash graph of
webgraph.py, but with PLANTED block structure: node ``v`` only links
inside its ``v % 4`` residue class, so the four blocks are provably
disconnected and the invariant ``community % 4 == doc_id % 4`` is a
hard certificate that propagation never leaks across components.

Plan shape (the scale story): per round — one equi-join of the
(u, v) adjacency against the |V|-row label table, one map-side-
combinable groupBy(u, label) count, one row_number window
partitioned by u (rank-1 argmax, never a sort of anything bigger
than a node's distinct neighbor labels), one left join back to nodes.
The adjacency is localCheckpointed once; rounds re-scan ONLY it plus
label tables (plan asserts a single parquet scan reaches the final
plan's checkpoint input).  All rows are 2-3 bigints; zero Python.
At 10^12 edges this is exactly GraphX's Pregel dataflow expressed
relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

LPA_ITERS = 3
LPA_OUT_K = 3
LPA_BLOCKS = 4


def block_edges(nodes: DataFrame, n_nodes: int) -> DataFrame:
    """Deterministic hash edges confined to the ``src % 4`` residue
    class; undirected (both arcs), self-loops dropped, deduped."""
    ks = F.array(*[F.lit(k) for k in range(LPA_OUT_K)])
    cells = (n_nodes + LPA_BLOCKS - 1) // LPA_BLOCKS
    fwd = (
        nodes.select(F.col("doc_id").alias("src"), F.explode(ks).alias("k"))
        .select(
            "src",
            (
                (
                    portable_hash60(
                        F.concat(
                            F.col("src").cast("string"),
                            F.lit(":"),
                            F.col("k").cast("string"),
                        )
                    )
                    % cells
                )
                * LPA_BLOCKS
                + F.col("src") % LPA_BLOCKS
            ).alias("dst"),
        )
        .filter((F.col("dst") != F.col("src")) & (F.col("dst") < n_nodes))
    )
    return (
        fwd.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionByName(
            fwd.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        )
        .distinct()
    )


def lpa_frame(nodes: DataFrame, adj: DataFrame) -> DataFrame:
    """(doc_id) nodes x (u, v) undirected adjacency -> (doc_id,
    community) after LPA_ITERS synchronous rounds."""
    adj = adj.localCheckpoint()
    labels = nodes.select(
        "doc_id", F.col("doc_id").cast("bigint").alias("lbl")
    )
    wr = Window.partitionBy("u").orderBy(
        F.col("c").desc(), F.col("lbl").asc()
    )
    for _ in range(LPA_ITERS):
        cnts = (
            adj.join(labels.withColumnRenamed("doc_id", "v"), "v")
            .groupBy("u", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        winner = (
            cnts.withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") == 1)
            .select(F.col("u").alias("doc_id"), F.col("lbl").alias("new"))
        )
        labels = nodes.join(labels, "doc_id").join(
            winner, "doc_id", "left"
        ).select(
            "doc_id", F.coalesce("new", "lbl").cast("bigint").alias("lbl")
        )
    return labels.select("doc_id", F.col("lbl").alias("community"))


def lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    n = nodes.count()
    return lpa_frame(nodes, block_edges(nodes, n))


def _lpa_sql() -> str:
    h = sql_hash60("src::VARCHAR || ':' || k::VARCHAR")
    ctes = [
        f"""nodes AS (SELECT doc_id FROM documents),
n1 AS (SELECT count(*)::BIGINT AS n FROM nodes),
fwd AS (
  SELECT src,
         (({h} % ((n + {LPA_BLOCKS} - 1) // {LPA_BLOCKS}))
          * {LPA_BLOCKS} + src % {LPA_BLOCKS}) AS dst
  FROM (SELECT doc_id AS src, unnest(range(0, {LPA_OUT_K})) AS k
        FROM nodes), n1
  WHERE (({h} % ((n + {LPA_BLOCKS} - 1) // {LPA_BLOCKS}))
         * {LPA_BLOCKS} + src % {LPA_BLOCKS}) != src
    AND (({h} % ((n + {LPA_BLOCKS} - 1) // {LPA_BLOCKS}))
         * {LPA_BLOCKS} + src % {LPA_BLOCKS}) < n
),
adj AS (SELECT DISTINCT u, v FROM
        (SELECT src AS u, dst AS v FROM fwd
         UNION ALL SELECT dst, src FROM fwd)),
l0 AS (SELECT doc_id, doc_id::BIGINT AS lbl FROM nodes)"""
    ]
    for i in range(1, LPA_ITERS + 1):
        p = i - 1
        ctes.append(
            f"""c{i} AS (SELECT a.u, l.lbl, count(*) AS c
      FROM adj a JOIN l{p} l ON l.doc_id = a.v GROUP BY 1, 2),
w{i} AS (SELECT u AS doc_id, lbl AS new FROM
        (SELECT u, lbl, row_number() OVER (PARTITION BY u
                 ORDER BY c DESC, lbl) AS rn FROM c{i})
        WHERE rn = 1),
l{i} AS (SELECT n.doc_id, coalesce(w.new, p.lbl)::BIGINT AS lbl
        FROM nodes n JOIN l{p} p USING (doc_id)
        LEFT JOIN w{i} w USING (doc_id))"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT doc_id, lbl AS community FROM l{LPA_ITERS}"
    )


LPA_SQL = _lpa_sql()


QUERIES: dict[str, tuple] = {
    "web_lpa_communities": (lpa_communities, LPA_SQL),
}
