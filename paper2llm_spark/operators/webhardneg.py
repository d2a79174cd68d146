"""Hard-negative mining over the embedding table — the contrastive-
training data stage (Schroff et al. CVPR 2015 FaceNet's semi-hard
mining made it standard; Robinson et al. ICLR 2021 "Contrastive
Learning with Hard Negative Samples"; DPR, Karpukhin et al. 2020,
mines exactly this table for retrieval training).  For each anchor
vector: the top-K most-similar vectors carrying a DIFFERENT label —
high-similarity/wrong-class pairs are the gradient-rich negatives a
contrastive batch wants — plus the hardest (least-similar) SAME-label
positive, giving the triplet margin in the same row set.

Semantics (frozen): anchors = ``vec_id % ANCHOR_EVERY == 0``.  Per
anchor: negatives = top ``TOPK`` by cosine among vectors with
``label != anchor.label`` (``kind = 'neg'``, rank 1..K by cos desc,
vec_id tiebreak); hardest positive = the single LOWEST-cosine vector
with ``label == anchor.label`` (``kind = 'pos'``, rank 1).  Cosine
follows the proven `cosine_topk` discipline exactly: norms staged
before the join, `round(cos, 4)` output (the similarity.py parity
contract the r2 driver rows certified).

Plan shape (the scale story): the anchor set is corpus/ANCHOR_EVERY
rows and BROADCASTS onto the vector table — one pass over the
corpus evaluates every (anchor, vector) pair with one staged dot
product, exactly the brute-force ANN baseline's cost envelope; the
two rankings share the single pass (one projection computes cos,
two windows partition by the same anchor_id key → ONE
hashpartitioning exchange).  At 10^9 vectors the labeled-bucket
IVF/LSH variants bound the candidate set the same way they bound
`ann_ivf_topk`'s — mining composes with any candidate generator
that preserves the label column; the exhaustive pass here is the
recall=1 baseline those variants are judged against (the
similarity.py discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .similarity import TOPK, _dot, _emb, _norm

ANCHOR_EVERY = 10


def hard_negatives_frame(emb: DataFrame) -> DataFrame:
    vecs = emb.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
    ).select("vec_id", "label", "v", _norm(F.col("v")).alias("nv"))
    anchors = vecs.filter(F.col("vec_id") % ANCHOR_EVERY == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("a_label"),
        F.col("v").alias("q"),
        F.col("nv").alias("nq"),
    )
    pairs = (
        F.broadcast(anchors)
        .crossJoin(
            vecs.select(
                F.col("vec_id").alias("neighbor_id"), "label", "v", "nv"
            )
        )
        .filter(F.col("anchor_id") != F.col("neighbor_id"))
        .select(
            "anchor_id",
            "a_label",
            "neighbor_id",
            "label",
            (_dot(F.col("q"), F.col("v")) / (F.col("nq") * F.col("nv")))
            .alias("cos"),
        )
    )
    w_neg = Window.partitionBy("anchor_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    negs = (
        pairs.filter(F.col("label") != F.col("a_label"))
        .withColumn("rank", F.row_number().over(w_neg))
        .filter(F.col("rank") <= TOPK)
        .select(
            "anchor_id",
            F.lit("neg").alias("kind"),
            F.col("rank").cast("bigint").alias("rank"),
            "neighbor_id",
            F.round("cos", 4).alias("cos4"),
        )
    )
    w_pos = Window.partitionBy("anchor_id").orderBy(
        F.col("cos").asc(), F.col("neighbor_id")
    )
    pos = (
        pairs.filter(F.col("label") == F.col("a_label"))
        .withColumn("rank", F.row_number().over(w_pos))
        .filter(F.col("rank") == 1)
        .select(
            "anchor_id",
            F.lit("pos").alias("kind"),
            F.col("rank").cast("bigint").alias("rank"),
            "neighbor_id",
            F.round("cos", 4).alias("cos4"),
        )
    )
    return negs.unionByName(pos)


def hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hard_negatives_frame(_emb(spark, sf_dir))


HARD_NEGATIVES_SQL = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
a AS (SELECT vec_id AS anchor_id, label AS a_label, v AS q
      FROM e WHERE vec_id % {ANCHOR_EVERY} = 0),
pairs AS (
  SELECT anchor_id, a_label, e.vec_id AS neighbor_id, e.label,
         list_dot_product(q, v) /
         (sqrt(list_dot_product(q, q)) * sqrt(list_dot_product(v, v))) AS cos
  FROM a CROSS JOIN e WHERE anchor_id <> e.vec_id
),
negs AS (
  SELECT anchor_id, 'neg' AS kind,
         row_number() OVER (PARTITION BY anchor_id
                            ORDER BY cos DESC, neighbor_id)::BIGINT AS rank,
         neighbor_id, round(cos, 4) AS cos4
  FROM pairs WHERE label <> a_label
),
pos AS (
  SELECT anchor_id, 'pos' AS kind,
         row_number() OVER (PARTITION BY anchor_id
                            ORDER BY cos ASC, neighbor_id)::BIGINT AS rank,
         neighbor_id, round(cos, 4) AS cos4
  FROM pairs WHERE label = a_label
)
SELECT * FROM negs WHERE rank <= {TOPK}
UNION ALL
SELECT * FROM pos WHERE rank = 1
"""


QUERIES: dict[str, tuple] = {
    "ann_hard_negatives": (hard_negatives, HARD_NEGATIVES_SQL),
}
