"""Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; the
interpolated form and D=0.75 from Chen & Goodman 1999's empirical
study — the smoothing KenLM made the web-curation standard: CCNet's
published filter is a KN 5-gram).  Complements this repo's Stupid
Backoff LM (weblm.py): KN's continuation counts fix exactly the case
backoff mis-scores — "Francisco" is frequent but follows almost
nothing except "San", so its UNIGRAM backoff weight should be tiny;
KN uses the count of DISTINCT LEFT CONTEXTS instead of raw
frequency.

Semantics (frozen): train split = even doc_ids (weblm.py's held-out
discipline — the unseen branches are real, scored docs include odd
ids the LM never saw); D = 0.75::

    P(w2|w1) = max(c12 - D, 0)/c1  +  (D · N1+(w1,·)/c1) · Pcont(w2)
    Pcont(w2) = (N1+(·,w2) + 1) / (N1+(··) + V_right + 1)

with N1+ the distinct-neighbor counts and the +1/V_right floor
applied UNIFORMLY so unseen right types get nonzero mass through ONE
expression shape (the documented deviation from textbook KN, which
leaves OOV Pcont undefined); w1 unseen as a context → P = Pcont(w2).
Per token ``floor(ln(P)·1e6 + 0.5)`` — one shape-identical double
``ln`` over identically-shaped double arithmetic, then exact bigint
sums (the weblm.py discipline).  Output per scored doc:
``(doc_id, n_bigrams, lp_sum_micro)``.

Plan shape (the scale story): ONE corpus-sized exchange — the
train-split bigram groupBy (map-side combinable); the context table
(c1, N1+(w1,·)) and the continuation table (N1+(·,w2)) both DERIVE
from the collapsed bigram table (Heaps-bounded, never a second
corpus agg — the weblm.py shape); scalars re-enter by 1-row
broadcast; scoring joins are vocabulary-sized and left to Catalyst
stats.  Zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, sql_ngrams, tokens, word_ngrams

KN_D = 0.75


def kn_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return kn_frame(docs)


def _bigrams(docs: DataFrame) -> DataFrame:
    return (
        docs.select(
            "doc_id",
            F.explode(
                word_ngrams(tokens(F.col("text")), 2)
            ).alias("g"),
        )
        .select(
            "doc_id",
            F.substring_index("g", " ", 1).alias("w1"),
            F.substring_index("g", " ", -1).alias("w2"),
        )
    )


def kn_frame(docs: DataFrame) -> DataFrame:
    all_big = _bigrams(docs)
    train = (
        all_big.filter(F.col("doc_id") % 2 == 0)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint()
    )
    ctx = train.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1w1")
    )
    cont = train.groupBy("w2").agg(F.count(F.lit(1)).alias("n1w2"))
    consts = train.agg(
        F.count(F.lit(1)).cast("bigint").alias("nbi"),
    ).crossJoin(
        F.broadcast(
            train.select("w2").distinct().agg(
                F.count(F.lit(1)).cast("bigint").alias("vr")
            )
        )
    )
    scored = (
        all_big.join(train, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            F.expr(
                f"""floor(ln(
                  CASE WHEN c1 IS NULL
                       THEN (coalesce(n1w2, 0) + 1) / (nbi + vr + 1)
                       ELSE greatest(coalesce(c12, 0) - {KN_D}, 0) / c1
                            + ({KN_D} * n1w1 / c1)
                              * ((coalesce(n1w2, 0) + 1) / (nbi + vr + 1))
                  END) * 1e6 + 0.5)"""
            ).cast("bigint").alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("lp").cast("bigint").alias("lp_sum_micro"),
    )


_TOK = SQL_TOKENS.format(expr="text")
_BIGRAMS = sql_ngrams("tok", 2)

KN_SQL = f"""
WITH t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
ab AS (
  SELECT doc_id, split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2
  FROM (SELECT doc_id, {_BIGRAMS} AS gs FROM t), unnest(gs) AS u(g)
),
train AS (
  SELECT w1, w2, count(*) AS c12 FROM ab WHERE doc_id % 2 = 0 GROUP BY 1, 2
),
ctx AS (SELECT w1, sum(c12) AS c1, count(*) AS n1w1 FROM train GROUP BY 1),
cont AS (SELECT w2, count(*) AS n1w2 FROM train GROUP BY 1),
consts AS (
  SELECT (SELECT count(*) FROM train)::BIGINT AS nbi,
         (SELECT count(DISTINCT w2) FROM train)::BIGINT AS vr
),
scored AS (
  SELECT ab.doc_id,
         floor(ln(
           CASE WHEN ctx.c1 IS NULL
                THEN (coalesce(cont.n1w2, 0) + 1) / (consts.nbi + consts.vr + 1)
                ELSE greatest(coalesce(train.c12, 0) - {KN_D}, 0) / ctx.c1
                     + ({KN_D} * ctx.n1w1 / ctx.c1)
                       * ((coalesce(cont.n1w2, 0) + 1)
                          / (consts.nbi + consts.vr + 1))
           END) * 1e6 + 0.5)::BIGINT AS lp
  FROM ab
  LEFT JOIN train ON train.w1 = ab.w1 AND train.w2 = ab.w2
  LEFT JOIN ctx ON ctx.w1 = ab.w1
  LEFT JOIN cont ON cont.w2 = ab.w2, consts
)
SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       sum(lp)::BIGINT AS lp_sum_micro
FROM scored GROUP BY doc_id
"""


QUERIES: dict[str, tuple] = {
    "text_kn_logprob": (kn_logprob, KN_SQL),
}
