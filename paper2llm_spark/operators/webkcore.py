"""k-core decomposition by parallel peeling (Seidman, Social Networks
1983; the standard link-spam / cohesion filter — link farms and
mutual-admiration rings survive deep cores, organically-linked pages
don't).  Crawl-graph pipelines use core membership as a spam prior
next to TrustRank (webtrust.py) and reciprocity (webrecip.py).

Semantics (frozen): undirected graph = weblpa.py's deterministic
residue-block hash graph (reused verbatim — one graph family across
the graph operators).  ``K_CORE = 5`` (the fixture graph's mean
undirected degree is ~5.6, so 5 splits it ~190/310 and every peel
wave removes more nodes — k=3 peels nothing and would make the gate
vacuous); ``PEEL_ROUNDS = 3`` synchronous
peel waves: each wave drops every node whose degree IN THE SURVIVING
SUBGRAPH is < K.  The true k-core is the fixpoint; a fixed wave count
keeps the dual unrollable and is exact whenever peeling converges
within R waves (degeneracy cascades longer than R are cut — the
production loop-until-unchanged variant is the same dataflow with a
data-dependent round count, noted, not coded).  Output per node:
``(doc_id, in_core, core_deg)`` with ``core_deg`` the node's degree
in the final surviving subgraph (0 outside it).

Plan shape (the scale story): the adjacency materializes once
(localCheckpoint); each wave is two semi-join-shaped equi-joins of
(u, v) bigint pairs against the alive set plus one map-side-
combinable degree count — the textbook parallel peeling round, O(E)
short rows per wave, no global sorts, zero Python (plan-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import sql_hash60
from .weblpa import LPA_BLOCKS, LPA_OUT_K, block_edges

K_CORE = 5
PEEL_ROUNDS = 3


def _alive_deg(adj: DataFrame, alive: DataFrame) -> DataFrame:
    e = adj.join(alive, "u").join(
        alive.withColumnRenamed("u", "v"), "v"
    )
    return e.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )


def kcore_frame(nodes: DataFrame, adj: DataFrame) -> DataFrame:
    adj = adj.localCheckpoint()
    alive = nodes.select(F.col("doc_id").alias("u"))
    for _ in range(PEEL_ROUNDS):
        deg = _alive_deg(adj, alive)
        alive = deg.filter(F.col("deg") >= K_CORE).select("u")
    final_deg = _alive_deg(adj, alive).withColumnRenamed("u", "doc_id")
    survivors = alive.withColumnRenamed("u", "doc_id").withColumn(
        "in_core", F.lit(True)
    )
    return (
        nodes.join(survivors, "doc_id", "left")
        .join(final_deg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("in_core", F.lit(False)).alias("in_core"),
            F.coalesce("deg", F.lit(0)).cast("bigint").alias("core_deg"),
        )
    )


def kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    n = nodes.count()
    return kcore_frame(nodes, block_edges(nodes, n))


def _kcore_sql() -> str:
    h = sql_hash60("src::VARCHAR || ':' || k::VARCHAR")
    cells = f"((n + {LPA_BLOCKS} - 1) // {LPA_BLOCKS})"
    dst = f"(({h} % {cells}) * {LPA_BLOCKS} + src % {LPA_BLOCKS})"
    ctes = [
        f"""nodes AS (SELECT doc_id FROM documents),
n1 AS (SELECT count(*)::BIGINT AS n FROM nodes),
fwd AS (
  SELECT src, {dst} AS dst
  FROM (SELECT doc_id AS src, unnest(range(0, {LPA_OUT_K})) AS k
        FROM nodes), n1
  WHERE {dst} != src AND {dst} < n
),
adj AS (SELECT DISTINCT u, v FROM
        (SELECT src AS u, dst AS v FROM fwd
         UNION ALL SELECT dst, src FROM fwd)),
a0 AS (SELECT doc_id AS u FROM nodes)"""
    ]
    for i in range(1, PEEL_ROUNDS + 1):
        p = i - 1
        ctes.append(
            f"""d{i} AS (SELECT e.u, count(*)::BIGINT AS deg
      FROM adj e JOIN a{p} x ON x.u = e.u JOIN a{p} y ON y.u = e.v
      GROUP BY 1),
a{i} AS (SELECT u FROM d{i} WHERE deg >= {K_CORE})"""
        )
    last = f"a{PEEL_ROUNDS}"
    return (
        "WITH " + ",\n".join(ctes)
        + f""",
fdeg AS (SELECT e.u AS doc_id, count(*)::BIGINT AS deg
         FROM adj e JOIN {last} x ON x.u = e.u
         JOIN {last} y ON y.u = e.v
         GROUP BY 1)
SELECT n.doc_id,
       (s.u IS NOT NULL) AS in_core,
       coalesce(f.deg, 0)::BIGINT AS core_deg
FROM nodes n
LEFT JOIN {last} s ON s.u = n.doc_id
LEFT JOIN fdeg f ON f.doc_id = n.doc_id"""
    )


KCORE_SQL = _kcore_sql()


QUERIES: dict[str, tuple] = {
    "web_kcore_membership": (kcore_membership, KCORE_SQL),
}
