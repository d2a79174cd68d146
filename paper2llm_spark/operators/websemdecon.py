"""Semantic decontamination — embedding-space eval-set leakage scan,
the fuzzy complement of this repo's n-gram decontamination
(operators/webstats.py `decontaminate_ngram_overlap`).  N-gram
overlap misses paraphrased or reformatted benchmark items; modern
pipelines therefore ALSO flag training docs whose embedding is
near-identical to an eval item (the practice popularized alongside
SemDeDup/D4-style embedding curation: nearest-neighbor cosine
against the benchmark set, threshold, drop or audit).

Semantics (frozen): the eval set is every vector with
``vec_id % 50 == 0`` (the benchmark was assembled from crawl text,
so its sources ARE in the training pool — the realistic worst case;
10 of 500 fixture vectors).  For every training vector (all rows),
find its nearest eval item by cosine (ties broken by lower eval id),
emit ``(vec_id, eval_id, cos4, contaminated)`` where ``cos4`` is the
cosine rounded to 4dp and ``contaminated = cos4 >= 0.95``.  Eval
rows themselves match at 1.0 — they must be flagged, that is the
leak.  Doubles are shape-identical across engines per the proven
pattern of operators/similarity.py `cosine_topk` (r2 hash-green).

Plan shape (the scale story): the eval set is tiny by definition
(10^3-10^5 benchmark items vs 10^12 docs), so the join is a
BROADCAST nested loop — the corpus is scanned ONCE, never shuffled;
norms are staged per side before the join so each pair costs one
dot product, not three folds.  The top-1-per-vector window
partitions by vec_id, which Spark runs inside the same scan-side
pipeline after the broadcast (one exchange for the window at most).
At 10^12 vectors the same plan holds; if the eval set ever outgrew
broadcast, band it with the hyperplane-LSH family in
operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

EVAL_MOD = 50
CONTAM_COS4 = 0.95


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id",
                F.col("embedding").cast("array<double>").alias("v"))
        .select("vec_id", "v", _norm(F.col("v")).alias("nv"))
    )
    evals = emb.where(F.col("vec_id") % EVAL_MOD == 0).select(
        F.col("vec_id").alias("eval_id"),
        F.col("v").alias("ev"),
        F.col("nv").alias("ne"),
    )
    pairs = emb.crossJoin(F.broadcast(evals)).withColumn(
        "cos", _dot(F.col("v"), F.col("ev")) / (F.col("nv") * F.col("ne"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("eval_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") == 1)
        .select(
            "vec_id", "eval_id",
            F.round("cos", 4).alias("cos4"),
            (F.round("cos", 4) >= CONTAM_COS4).alias("contaminated"),
        )
    )


SEMANTIC_DECON_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
ev AS (SELECT vec_id AS eval_id, v AS evv FROM e
       WHERE vec_id % {EVAL_MOD} = 0),
pairs AS (
  SELECT e.vec_id, ev.eval_id,
         list_dot_product(e.v, ev.evv) /
         (sqrt(list_dot_product(e.v, e.v))
          * sqrt(list_dot_product(ev.evv, ev.evv))) AS cos
  FROM e CROSS JOIN ev
),
ranked AS (
  SELECT vec_id, eval_id, cos,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, eval_id) AS rank
  FROM pairs
)
SELECT vec_id, eval_id, round(cos, 4) AS cos4,
       (round(cos, 4) >= {CONTAM_COS4}) AS contaminated
FROM ranked WHERE rank = 1
"""


QUERIES: dict[str, tuple] = {
    "decontaminate_semantic": (semantic_decontaminate, SEMANTIC_DECON_SQL),
}
