"""Triangle counting + local clustering coefficient (Schank & Wagner
2005 degree-ordered node iterator; Suri & Vassilvitskii WWW'11 made
it the canonical MapReduce graph kernel).  Web-graph triangles
separate organic link neighborhoods (high closure) from link farms
and generated spam (star-shaped, closure ~0) — the metric TrustRank
and k-core sit next to on every webspam feature list.

Semantics (frozen): undirected graph = weblpa.py's deterministic
residue-block hash graph (one graph family across the graph
operators).  Edges are ORIENTED by the total order ``(degree, id)``
— every edge points low-to-high — so each triangle is generated
EXACTLY once as an ordered wedge ``a->b, a->c`` (b before c) closed
by the arc ``b->c``; per node, ``n_tri`` counts triangles through it
and ``cc_micro = 2 * n_tri * 1e6 div (deg * (deg - 1))`` is the
exact-integer local clustering coefficient (0 where deg < 2).

Plan shape (the scale story): the degree orientation is WHY this
scales — wedge fanout is bounded by the smaller endpoint's oriented
out-degree (O(m * alpha) total work, the Schank-Wagner bound), so a
10^8-degree hub generates no wedges; by-id orientation would put the
hub's entire neighborhood on one side and explode.  Dataflow: degree
groupBy, one self-equi-join of oriented arcs (wedges), one equi-join
against the arc set (closure), one explode-by-3 + groupBy(node).
All rows are 2-3 bigints; the adjacency materializes once
(localCheckpoint); zero Python (plan-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import sql_hash60
from .weblpa import LPA_BLOCKS, LPA_OUT_K, block_edges

MICRO = 1_000_000


def triangle_frame(nodes: DataFrame, adj: DataFrame) -> DataFrame:
    """(doc_id) nodes x (u, v) undirected adjacency (both arcs) ->
    (doc_id, deg, n_tri, cc_micro)."""
    adj = adj.localCheckpoint()
    deg = adj.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    # orient every edge low-to-high in the (deg, id) total order
    arcs = (
        adj.join(deg.withColumnRenamed("u", "u_"), F.col("u") == F.col("u_"))
        .drop("u_").withColumnRenamed("deg", "du")
        .join(
            deg.select(F.col("u").alias("v_"), F.col("deg").alias("dv")),
            F.col("v") == F.col("v_"),
        )
        .drop("v_")
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v", "dv")
        .localCheckpoint()
    )
    # ordered wedges a->b, a->c with b before c in the same total order
    left = arcs.select(
        F.col("u").alias("a"), F.col("v").alias("b"),
        F.col("dv").alias("db"),
    )
    right = arcs.select(
        F.col("u").alias("a"), F.col("v").alias("c"),
        F.col("dv").alias("dc"),
    )
    wedges = left.join(right, "a").filter(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    tris = wedges.join(
        arcs.select(F.col("u").alias("b"), F.col("v").alias("c")),
        ["b", "c"],
    ).select("a", "b", "c")
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tri"))
    )
    return (
        nodes.join(deg.withColumnRenamed("u", "doc_id"), "doc_id", "left")
        .join(per_node, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("deg", F.lit(0)).cast("bigint").alias("deg"),
            F.coalesce("n_tri", F.lit(0)).cast("bigint").alias("n_tri"),
            F.expr(
                f"case when coalesce(deg, 0) >= 2 then "
                f"2 * coalesce(n_tri, 0) * {MICRO}"
                f" div (deg * (deg - 1)) else 0 end"
            ).cast("bigint").alias("cc_micro"),
        )
    )


def triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    n = nodes.count()
    return triangle_frame(nodes, block_edges(nodes, n))


def _triangle_sql() -> str:
    h = sql_hash60("src::VARCHAR || ':' || k::VARCHAR")
    cells = f"((n + {LPA_BLOCKS} - 1) // {LPA_BLOCKS})"
    dst = f"(({h} % {cells}) * {LPA_BLOCKS} + src % {LPA_BLOCKS})"
    return f"""
WITH nodes AS (SELECT doc_id FROM documents),
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
deg AS (SELECT u, count(*)::BIGINT AS deg FROM adj GROUP BY 1),
arcs AS (
  SELECT a.u, a.v, dv.deg AS dv
  FROM adj a JOIN deg du ON du.u = a.u JOIN deg dv ON dv.u = a.v
  WHERE du.deg < dv.deg OR (du.deg = dv.deg AND a.u < a.v)
),
wedges AS (
  SELECT l.u AS a, l.v AS b, r.v AS c
  FROM arcs l JOIN arcs r ON r.u = l.u
  WHERE l.dv < r.dv OR (l.dv = r.dv AND l.v < r.v)
),
tris AS (
  SELECT w.a, w.b, w.c
  FROM wedges w JOIN arcs e ON e.u = w.b AND e.v = w.c
),
per_node AS (
  SELECT x AS doc_id, count(*)::BIGINT AS n_tri
  FROM (SELECT unnest([a, b, c]) AS x FROM tris)
  GROUP BY 1
)
SELECT n.doc_id,
       coalesce(d.deg, 0)::BIGINT AS deg,
       coalesce(t.n_tri, 0)::BIGINT AS n_tri,
       (CASE WHEN coalesce(d.deg, 0) >= 2
             THEN 2 * coalesce(t.n_tri, 0) * {MICRO}
                  // (d.deg * (d.deg - 1))
             ELSE 0 END)::BIGINT AS cc_micro
FROM nodes n
LEFT JOIN deg d ON d.u = n.doc_id
LEFT JOIN per_node t ON t.doc_id = n.doc_id
"""


TRIANGLE_SQL = _triangle_sql()


QUERIES: dict[str, tuple] = {
    "web_triangle_counts": (triangle_counts, TRIANGLE_SQL),
}
