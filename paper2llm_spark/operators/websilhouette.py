"""Simplified-silhouette cluster validity (Rousseeuw, J. Comp. Appl.
Math 1987; the centroid-based "simplified silhouette" of Hruschka et
al. that sklearn large-scale guides recommend when O(n^2) pairwise is
off the table).  Embedding-curation pipelines (SemDeDup, D4, IVF
sizing) pick k and accept/reject a clustering by exactly this score —
a cluster whose members sit closer to ANOTHER centroid than their own
is a mis-sized quantizer.

Semantics (frozen): cells are the IVF coarse quantizer of
similarity.py (argmax-dot over the md5-seeded CENTROIDS literals,
1-indexed, first-max tie-break — the SAME assignment `ivf_topk`
uses, so the score audits the quantizer actually deployed).  Per
vector: ``a = euclidean distance to own centroid``, ``b = min
distance to any other centroid``, ``s = (b - a) / max(a, b)``
(``0`` when both distances are 0), computed as ONE shape-identical
double expression over 4dp-washed squared distances, then frozen to
exact micro-units via ``floor(s * 1e6 + 0.5)``.  Output per cell:
``(cell, n_vecs, mean_s_micro, min_s_micro)`` with the mean as the
exact bigint ``sum div n``.

Plan shape (the scale story): centroids are LITERALS in the
instruction stream (the PQ-codebook discipline) — assignment, both
distances, and the score are one codegen projection over the scan;
the ONLY exchange is the final map-side-combinable groupBy(cell)
collapsing 10^9 vectors to N_CELLS rows.  Zero joins, zero Python
(plan-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import CENTROIDS, _cell_expr, _cell_sql


def _d2_expr(vcol, c: list[float]):
    return F.round(
        F.aggregate(
            F.zip_with(
                vcol,
                F.array(*[F.lit(x) for x in c]),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        4,
    )


def silhouette_frame(emb: DataFrame) -> DataFrame:
    """(vec_id, v: array<double>) -> per-cell silhouette summary."""
    d2s = F.array(*[_d2_expr(F.col("v"), c) for c in CENTROIDS])
    per = emb.select(
        _cell_expr(F.col("v")).alias("cell"),
        d2s.alias("d2s"),
    ).select(
        "cell",
        F.expr("element_at(d2s, int(cell))").alias("a2"),
        # least() ignores NULLs in both engines: mask own cell, take
        # the smallest other-centroid distance as a literal 8-term least
        F.expr(
            "least(" + ", ".join(
                f"case when cell = {i + 1} then null"
                f" else element_at(d2s, {i + 1}) end"
                for i in range(len(CENTROIDS))
            ) + ")"
        ).alias("b2"),
    ).select(
        "cell",
        F.expr(
            "case when greatest(sqrt(a2), sqrt(b2)) = 0.0 then 0L else "
            "cast(floor((sqrt(b2) - sqrt(a2)) / "
            "greatest(sqrt(a2), sqrt(b2)) * 1000000.0 + 0.5) as bigint)"
            " end"
        ).alias("s_micro"),
    )
    return per.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.expr("sum(s_micro) div count(1)").cast("bigint")
        .alias("mean_s_micro"),
        F.min("s_micro").cast("bigint").alias("min_s_micro"),
    )


def ann_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return silhouette_frame(emb)


def _d2_sql(vexpr: str, c: list[float]) -> str:
    lit = "[" + ", ".join(repr(float(x)) for x in c) + "]"
    return (
        f"round(list_sum(list_transform(list_zip({vexpr}, {lit}), "
        "p -> (p[1] - p[2]) * (p[1] - p[2]))), 4)"
    )


def _silhouette_sql() -> str:
    d2s = "[" + ", ".join(_d2_sql("v", c) for c in CENTROIDS) + "]"
    cell = _cell_sql("v")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
asg AS (
  SELECT ({cell})::BIGINT AS cell, {d2s} AS d2s FROM e
),
ab AS (
  SELECT cell,
         d2s[cell::INT] AS a2,
         least({", ".join(
             f"CASE WHEN cell = {i + 1} THEN NULL"
             f" ELSE d2s[{i + 1}] END"
             for i in range(len(CENTROIDS))
         )}) AS b2
  FROM asg
),
per AS (
  SELECT cell,
         CASE WHEN greatest(sqrt(a2), sqrt(b2)) = 0.0 THEN 0
              ELSE floor((sqrt(b2) - sqrt(a2))
                         / greatest(sqrt(a2), sqrt(b2))
                         * 1000000.0 + 0.5)::BIGINT END AS s_micro
  FROM ab
)
SELECT cell, count(*)::BIGINT AS n_vecs,
       (sum(s_micro) // count(*))::BIGINT AS mean_s_micro,
       min(s_micro)::BIGINT AS min_s_micro
FROM per GROUP BY 1
"""


SILHOUETTE_SQL = _silhouette_sql()


QUERIES: dict[str, tuple] = {
    "ann_silhouette": (ann_silhouette, SILHOUETTE_SQL),
}
