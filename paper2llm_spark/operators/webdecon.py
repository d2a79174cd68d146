"""Composed decontamination funnel — the three published eval-leakage
tiers staged cheapest-first, with per-doc stage attribution: exact
duplicate (digest equality, the tier OLMo/Dolma's decon tooling runs
first), n-gram overlap (GPT-3 appendix C / Llama-style 4-gram hits vs
the benchmark gram set, this repo's `decontaminate_ngram_overlap`
semantics), and semantic near-match (embedding cosine vs the eval set,
the SemDeDup-era tier of `decontaminate_semantic`).  A doc's verdict
is the FIRST tier that trips — ``exact | ngram | semantic | clean`` —
so each expensive tier runs only on the survivors of the cheaper one,
exactly how a production decon pass is sequenced.

Semantics (frozen): benchmark = docs with ``doc_id % 97 == 0`` (the
webstats BENCH_MOD discipline; the eval suite was drawn from the
crawl, so its members sit in the pool and must trip tier 1 by
self-match).  Tier 2: distinct word-4-gram hits vs the benchmark gram
set; trips iff ``n_grams > 0 AND 1000*hits >= 300*n_grams`` (30%
overlap, exact integer cross-product).  Tier 3: survivors join their
embedding (``orig`` id = ``vec_id``), nearest eval-vector cosine
(eval = ``vec_id % 97 == 0``), trips iff ``round(max_cos,4) >= 0.95``
(the websemdecon threshold; doubles shape-identical per the proven
similarity.py pattern).  Stage-not-reached sentinels are ``-1`` /
``-1.0`` — NEVER null integers (a null gap turns DuckDB's int column
into pandas float64 and breaks the driver hash; the r3
`corpus_sequence_pack` lesson).  Both missing polarities are PLANTED
in-engine from each benchmark doc: a ``'zq '``-prefixed variant
(shares every original 4-gram, different digest -> must stop at tier
2) and a token-REVERSED variant (kills 4-gram overlap, same vec by
``orig`` key, cos 1.0 -> must fall through to tier 3).

Plan shape (the scale story): benchmark digests and grams are tiny by
construction (eval suites are MBs) -> BROADCAST joins; the gram stage
is one explode + broadcast-hash-join + one map-side-combinable
groupBy(doc_id) — the single corpus-sized exchange with payload
(16-byte gram-hash rows).  The reassembly left-joins move only
short signal rows (doc_id, flags, two bigints, one double); raw text
never rides an exchange (plan-asserted).  The digest+gram projection
is localCheckpointed once so the union corpus is derived in a single
pass; at 10^12 docs the same two-consumer shape would re-derive from
the scan instead — the checkpoint is an explicit small-scale
convenience, the join/broadcast shapes are the scale story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    SQL_TOKENS, portable_hash60, sql_hash60, sql_ngrams, tokens,
    word_ngrams,
)

BENCH_MOD = 97
DECON_N = 4
NGRAM_MILLE = 300
SEM_COS4 = 0.95
P2_BASE = 30_000_000   # 30M % 97 == 34: planted ids are never benchmark
P3_BASE = 40_000_000   # 40M % 97 == 13


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


def decontaminate_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    base = docs.select(
        "doc_id", F.col("doc_id").alias("orig"), "text"
    )
    seed = base.filter(F.col("doc_id") % BENCH_MOD == 0)
    p2 = seed.select(
        (F.col("doc_id") + P2_BASE).alias("doc_id"), "orig",
        F.concat(F.lit("zq "), F.col("text")).alias("text"),
    )
    p3 = seed.select(
        (F.col("doc_id") + P3_BASE).alias("doc_id"), "orig",
        F.concat_ws(" ", F.reverse(tokens(F.col("text")))).alias("text"),
    )
    corpus = base.unionByName(p2).unionByName(p3)
    enr = corpus.select(
        "doc_id", "orig",
        F.md5("text").alias("dig"),
        F.array_distinct(
            F.transform(
                word_ngrams(tokens(F.col("text")), DECON_N),
                lambda g: portable_hash60(g),
            )
        ).alias("ghs"),
    ).localCheckpoint()

    bench = enr.filter(F.col("doc_id") % BENCH_MOD == 0)
    bdig = bench.select("dig").distinct().withColumn("bd", F.lit(1))
    bgrams = (
        bench.select(F.explode("ghs").alias("gh"))
        .distinct()
        .withColumn("bg", F.lit(1))
    )

    s1 = enr.join(F.broadcast(bdig), "dig", "left").select(
        "doc_id", "orig", "ghs",
        F.col("bd").isNotNull().alias("exact_hit"),
    )
    surv1 = s1.filter(~F.col("exact_hit"))
    sig2 = (
        surv1.select(
            "doc_id", "orig",
            F.size("ghs").cast("bigint").alias("n_grams"),
            F.explode_outer("ghs").alias("gh"),
        )
        .join(F.broadcast(bgrams), "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.max("orig").alias("orig"),
            F.max("n_grams").alias("n_grams"),
            F.count("bg").cast("bigint").alias("n_hits"),
        )
        .withColumn(
            "ngram_hit",
            (F.col("n_grams") > 0)
            & (1000 * F.col("n_hits") >= NGRAM_MILLE * F.col("n_grams")),
        )
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    evals = emb.where(F.col("vec_id") % BENCH_MOD == 0).select(
        F.col("v").alias("ev")
    )
    sig3 = (
        sig2.filter(~F.col("ngram_hit"))
        .select("doc_id", "orig")
        .join(emb, F.col("orig") == F.col("vec_id"))
        .crossJoin(F.broadcast(evals))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.max(
                    _dot(F.col("v"), F.col("ev"))
                    / (_norm(F.col("v")) * _norm(F.col("ev")))
                ),
                4,
            ).alias("cos4")
        )
    )

    out = (
        s1.select("doc_id", "exact_hit")
        .join(sig2.select("doc_id", "n_grams", "n_hits", "ngram_hit"),
              "doc_id", "left")
        .join(sig3, "doc_id", "left")
    )
    return out.select(
        "doc_id",
        F.when(F.col("exact_hit"), F.lit("exact"))
        .when(F.col("ngram_hit"), F.lit("ngram"))
        .when(F.col("cos4") >= SEM_COS4, F.lit("semantic"))
        .otherwise(F.lit("clean"))
        .alias("verdict"),
        F.coalesce("n_grams", F.lit(-1)).cast("bigint").alias("n_grams"),
        F.coalesce("n_hits", F.lit(-1)).cast("bigint").alias("gram_hits"),
        F.coalesce("cos4", F.lit(-1.0)).cast("double").alias("cos4"),
    )


_TOKLIST = SQL_TOKENS.format(expr="text")
_GH = sql_hash60("gram")

DECON_FUNNEL_SQL = f"""
WITH base AS (SELECT doc_id, doc_id AS orig, text FROM documents),
seed AS (SELECT * FROM base WHERE doc_id % {BENCH_MOD} = 0),
corpus AS (
  SELECT doc_id, orig, text FROM base
  UNION ALL
  SELECT doc_id + {P2_BASE}, orig, 'zq ' || text FROM seed
  UNION ALL
  SELECT doc_id + {P3_BASE}, orig,
         array_to_string(list_reverse({_TOKLIST}), ' ') FROM seed
),
enr AS (SELECT doc_id, orig, md5(text) AS dig, text FROM corpus),
g AS (
  SELECT doc_id, {_GH} AS gh
  FROM (SELECT doc_id, unnest({sql_ngrams('tok', DECON_N)}) AS gram
        FROM (SELECT doc_id, {_TOKLIST} AS tok FROM corpus))
  GROUP BY doc_id, gh
),
bdig AS (SELECT DISTINCT dig FROM enr WHERE doc_id % {BENCH_MOD} = 0),
bgr AS (SELECT DISTINCT gh FROM g WHERE doc_id % {BENCH_MOD} = 0),
s1 AS (
  SELECT doc_id, orig,
         (dig IN (SELECT dig FROM bdig)) AS exact_hit
  FROM enr
),
surv1 AS (SELECT doc_id, orig FROM s1 WHERE NOT exact_hit),
ng AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM g
       WHERE doc_id IN (SELECT doc_id FROM surv1) GROUP BY doc_id),
hits AS (
  SELECT g.doc_id, count(*)::BIGINT AS n_hits
  FROM g JOIN bgr USING (gh)
  WHERE g.doc_id IN (SELECT doc_id FROM surv1)
  GROUP BY g.doc_id
),
s2 AS (
  SELECT v.doc_id, v.orig,
         coalesce(ng.n_grams, 0)::BIGINT AS n_grams,
         coalesce(hits.n_hits, 0)::BIGINT AS n_hits,
         (coalesce(ng.n_grams, 0) > 0
          AND 1000 * coalesce(hits.n_hits, 0)
              >= {NGRAM_MILLE} * coalesce(ng.n_grams, 0)) AS ngram_hit
  FROM surv1 v LEFT JOIN ng USING (doc_id) LEFT JOIN hits USING (doc_id)
),
emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
ev AS (SELECT v AS evv FROM emb WHERE vec_id % {BENCH_MOD} = 0),
s3 AS (
  SELECT s.doc_id,
         round(max(list_dot_product(e.v, ev.evv) /
                   (sqrt(list_dot_product(e.v, e.v))
                    * sqrt(list_dot_product(ev.evv, ev.evv)))), 4) AS cos4
  FROM s2 s JOIN emb e ON e.vec_id = s.orig CROSS JOIN ev
  WHERE NOT s.ngram_hit
  GROUP BY s.doc_id
)
SELECT s1.doc_id,
       CASE WHEN s1.exact_hit THEN 'exact'
            WHEN s2.ngram_hit THEN 'ngram'
            WHEN s3.cos4 >= {SEM_COS4} THEN 'semantic'
            ELSE 'clean' END AS verdict,
       coalesce(s2.n_grams, -1)::BIGINT AS n_grams,
       coalesce(s2.n_hits, -1)::BIGINT AS gram_hits,
       coalesce(s3.cos4, -1.0)::DOUBLE AS cos4
FROM s1 LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)
"""


QUERIES: dict[str, tuple] = {
    "decontaminate_funnel": (decontaminate_funnel, DECON_FUNNEL_SQL),
}
