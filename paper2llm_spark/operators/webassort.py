"""Degree assortativity (Newman, PRL 2002) — the single number that
says whether a link graph is social-like (high-degree nodes link to
high-degree nodes, r > 0) or web/biological-like (hubs link to
leaves, r < 0).  Crawl-graph audits report it next to the degree
distribution: generated link farms flip the sign of the neighborhood
they infest, which is why it appears in webspam feature sets with
TrustRank and triangle closure.

Semantics (frozen, FULLY exact integers — no float Pearson): over
the DIRECTED arc list (both orientations of every undirected edge,
M arcs), with j, k the endpoint degrees of each arc, symmetry makes
the two marginals identical, so Newman's r collapses to the exact
rational ``r = (M*S_jk - S_j^2) / (M*S_jj - S_j^2)`` with
``S_jk = sum(j*k)``, ``S_j = sum(j)``, ``S_jj = sum(j*j)`` — emitted
as ``r_micro = (M*S_jk - S_j^2) * 1e6 div (M*S_jj - S_j^2)``
(regular graphs have zero denominator -> r_micro = 0 by the frozen
guard).  Graph = weblpa.py's residue-block hash graph.  Output one
row: ``(m_arcs, mean_deg_milli, r_micro)``.

Intermediate products reach ``M * max_deg^2``; at 10^12-edge scale
the exact path needs 128-bit accumulation (Spark DECIMAL(38,0) /
DuckDB HUGEINT — both available, the swap is a cast), noted here and
safe by orders of magnitude at fixture scale.

Plan shape (the scale story): degree groupBy + one broadcast-joinable
degree re-entry per endpoint + ONE global agg of five bigint sums —
the arc table is scanned once; zero Python (plan-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import sql_hash60
from .weblpa import LPA_BLOCKS, LPA_OUT_K, block_edges

MICRO = 1_000_000


def assortativity_frame(adj: DataFrame) -> DataFrame:
    """(u, v) directed arc list (both orientations) -> 1-row summary."""
    deg = adj.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    arcs = (
        adj.join(deg, "u")
        .withColumnRenamed("deg", "j")
        .join(
            deg.select(F.col("u").alias("v"), F.col("deg").alias("k")),
            "v",
        )
    )
    sums = arcs.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(F.col("j") * F.col("k")).cast("bigint").alias("sjk"),
        F.sum("j").cast("bigint").alias("sj"),
        F.sum(F.col("j") * F.col("j")).cast("bigint").alias("sjj"),
    )
    return sums.select(
        F.col("m").alias("m_arcs"),
        F.expr("sj * 1000 div m").cast("bigint").alias("mean_deg_milli"),
        F.expr(
            f"case when m * sjj - sj * sj = 0 then 0L else "
            f"(m * sjk - sj * sj) * {MICRO} div (m * sjj - sj * sj) end"
        ).cast("bigint").alias("r_micro"),
    )


def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    n = nodes.count()
    return assortativity_frame(block_edges(nodes, n))


def _assort_sql() -> str:
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
  SELECT dj.deg AS j, dk.deg AS k
  FROM adj a JOIN deg dj ON dj.u = a.u JOIN deg dk ON dk.u = a.v
),
sums AS (
  SELECT count(*)::BIGINT AS m,
         sum(j * k)::BIGINT AS sjk,
         sum(j)::BIGINT AS sj,
         sum(j * j)::BIGINT AS sjj
  FROM arcs
)
SELECT m AS m_arcs,
       (sj * 1000 // m)::BIGINT AS mean_deg_milli,
       (CASE WHEN m * sjj - sj * sj = 0 THEN 0
             ELSE (m * sjk - sj * sj) * {MICRO}
                  // (m * sjj - sj * sj) END)::BIGINT AS r_micro
FROM sums
"""


ASSORT_SQL = _assort_sql()


QUERIES: dict[str, tuple] = {
    "web_degree_assortativity": (degree_assortativity, ASSORT_SQL),
}
