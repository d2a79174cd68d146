"""Data-selection operators (SURVEY.md §2.11) — choosing WHAT to train
on once the corpus is clean.

* **DSIR importance weights** (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling"): score every raw document
  by the log-likelihood ratio of a TARGET hashed-n-gram model vs the
  raw-corpus (source) model; resampling by these weights shifts the
  corpus toward the target distribution.  Target here = the ``lang =
  'en'`` slice (at production scale: a Wikipedia/books sample).  Plan
  shape: the two bucket-count passes are map-side-combinable groupBys
  whose output is **DSIR_BUCKETS rows** (hashed feature space, not
  vocabulary) — broadcast to the scoring pass, which is one explode +
  broadcast-hash-join + one groupBy(doc_id).  Nothing corpus-sized
  shuffles except (doc_id, partial sums).  Log-ratios travel as exact
  bigint micro-nats (the webcorpus.unigram_logprob trick) so partial-sum
  order cannot flip a weight between engines.

* **URL canonicalization + dedup** (the RefinedWeb §3.2 / CCNet "url
  dedup" stage that runs BEFORE any content fetch/parse): scheme+host
  lowercased, ``www.`` and default ports stripped, tracking params
  (utm_*/fbclid/gclid) removed, fragments dropped, trailing slash
  normalized — then keep min(doc_id) per canonical URL.  Pure codegen
  regex algebra feeding ONE short-key groupBy (the url digest), the
  same survives-any-scale shape as exact dedup.  The documents table
  carries no URL column, so the query synthesizes deterministic messy
  URLs from (source, doc_id) IN BOTH ENGINES — the canonicalization
  chain is what the gate verifies.

Both queries have DuckDB duals with identical column names and the
engine-identical floor(x*1e4+0.5)/1e4 rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    SQL_TOKENS,
    portable_hash60,
    sql_hash60,
    sql_ngrams,
    tokens,
    word_ngrams,
)

DSIR_BUCKETS = 64   # hashed-feature space (production: 10^4; corpus-sized here)
DSIR_TARGET_LANG = "en"

_TOK = SQL_TOKENS.format(expr="text")


def _docs(spark: SparkSession, sf_dir: str, spread: bool = True) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if spread:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def _round4(col: Column) -> Column:
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


# ---------------------------------------------------------------------------
# DSIR hashed-n-gram importance weights
# ---------------------------------------------------------------------------

def dsir_weights_frame(docs: DataFrame) -> DataFrame:
    """Per-doc DSIR importance log-ratio over hashed word bigrams.

    weight(doc) = sum over bigram features f of
    ln(p_target(bucket(f)) / p_source(bucket(f))), add-1 smoothed over
    DSIR_BUCKETS buckets.  Docs with no bigrams score 0 with n_grams=0
    (left join keeps them).
    """
    grams = docs.select(
        "doc_id", "lang", tokens(F.col("text")).alias("tok")
    ).select(
        "doc_id", "lang",
        F.explode(word_ngrams(F.col("tok"), 2)).alias("g"),
    ).select(
        "doc_id", "lang",
        (portable_hash60(F.col("g")) % DSIR_BUCKETS).alias("b"),
    )
    src = grams.groupBy("b").agg(F.count("*").alias("cs"))
    tgt = (
        grams.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count("*").alias("ct"))
    )
    totals = src.agg(F.sum("cs").alias("ts")).crossJoin(
        tgt.agg(F.sum("ct").alias("tt"))
    )
    # bucket log-ratio in exact micro-nats; identical expression shape in
    # the dual so the doubles agree bit-for-bit before the floor
    lr = (
        src.join(tgt, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.floor(
                F.log(
                    ((F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                     / (F.col("tt") + F.lit(float(DSIR_BUCKETS))))
                    / ((F.col("cs") + F.lit(1.0))
                       / (F.col("ts") + F.lit(float(DSIR_BUCKETS))))
                )
                * 1000000
                + F.lit(0.5)
            ).cast("bigint").alias("lr_micro"),
        )
    )
    per_doc = (
        grams.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum("lr_micro").alias("sum_micro"),
        )
    )
    return (
        docs.select("doc_id", "lang")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            _round4(
                F.coalesce(F.col("sum_micro"), F.lit(0)) / F.lit(1000000.0)
            ).alias("dsir_logratio"),
        )
    )


def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dsir_weights_frame(_docs(spark, sf_dir))


_BIGRAMS = sql_ngrams("tok", 2)

DSIR_WEIGHTS_SQL = f"""
WITH toks AS (SELECT doc_id, lang, {_TOK} AS tok FROM documents),
grams AS (
  SELECT doc_id, lang,
         {sql_hash60("g")} % {DSIR_BUCKETS} AS b
  FROM (SELECT doc_id, lang, unnest({_BIGRAMS}) AS g FROM toks)
),
src AS (SELECT b, count(*) AS cs FROM grams GROUP BY b),
tgt AS (SELECT b, count(*) AS ct FROM grams
        WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b),
totals AS (
  SELECT (SELECT sum(cs) FROM src) AS ts, (SELECT sum(ct) FROM tgt) AS tt
),
lr AS (
  SELECT src.b,
         floor(ln(((coalesce(ct, 0) + 1.0) / (tt + {float(DSIR_BUCKETS)}))
                  / ((cs + 1.0) / (ts + {float(DSIR_BUCKETS)})))
               * 1000000 + 0.5)::BIGINT AS lr_micro
  FROM src LEFT JOIN tgt ON src.b = tgt.b CROSS JOIN totals
),
per_doc AS (
  SELECT doc_id, count(*)::BIGINT AS n_grams, sum(lr_micro) AS sum_micro
  FROM grams JOIN lr USING (b)
  GROUP BY doc_id
)
SELECT d.doc_id, d.lang,
       coalesce(p.n_grams, 0)::BIGINT AS n_grams,
       floor(coalesce(p.sum_micro, 0) / 1000000.0 * 10000 + 0.5) / 10000
         AS dsir_logratio
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


# ---------------------------------------------------------------------------
# URL canonicalization + dedup
# ---------------------------------------------------------------------------

# messy-URL synthesis: 4 deterministic variants per path so the
# canonicalizer has fragments, tracking params, default ports and
# www-prefixes to strip; doc_id % 157 gives ~3 docs per (source, path)
# group at sf0.01
URL_PATH_MOD = 157

_TRACKING = r"(utm_[a-z]+|fbclid|gclid)=[^&#]*&?"


def _messy_url(doc_id: Column, source: Column) -> Column:
    return F.concat(
        F.lit("HTTPS://WWW."),
        source,
        F.lit(".Example.COM:443/Articles/"),
        (doc_id % URL_PATH_MOD).cast("string"),
        F.when(doc_id % 4 == 0, F.lit("?utm_source=feed&utm_campaign=x&ref=home"))
        .when(doc_id % 4 == 1, F.lit("/?fbclid=AbC123"))
        .when(doc_id % 4 == 2, F.lit("#section-3"))
        .otherwise(F.lit("/")),
    )


def canonicalize_url(url: Column) -> Column:
    """RefinedWeb-style URL canonicalization, pure codegen regex."""
    # 1. drop fragment
    u = F.regexp_replace(url, r"#.*$", "")
    # 2. lowercase scheme://host (path/query casing preserved)
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([^/]*//[^/]*)", 1)),
        F.regexp_replace(u, r"^[^/]*//[^/]*", ""),
    )
    # 3. strip www. and default ports
    u = F.regexp_replace(u, r"^([a-z]+://)www\.", r"$1")
    u = F.regexp_replace(u, r":(443|80)(/|\?|$)", r"$2")
    # 4. remove tracking params, then tidy the leftover separators
    u = F.regexp_replace(u, _TRACKING, "")
    u = F.regexp_replace(u, r"[?&]$", "")
    # 5. trailing slash off a non-empty path
    u = F.regexp_replace(u, r"([^/])/$", r"$1")
    return u


def url_dedup_frame(docs: DataFrame) -> DataFrame:
    canon = docs.select(
        "doc_id",
        canonicalize_url(_messy_url(F.col("doc_id"), F.col("source"))).alias(
            "canonical_url"
        ),
    )
    return canon.groupBy("canonical_url").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count("*").alias("dup_count"),
    )


def url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same shape as exact dedup: the groupBy's map-side partial agg runs
    # inside the scan task, so no spread exchange (spread=False)
    return url_dedup_frame(_docs(spark, sf_dir, spread=False))


URL_DEDUP_SQL = f"""
WITH messy AS (
  SELECT doc_id,
         'HTTPS://WWW.' || source || '.Example.COM:443/Articles/'
           || (doc_id % {URL_PATH_MOD})
           || CASE
                WHEN doc_id % 4 = 0 THEN '?utm_source=feed&utm_campaign=x&ref=home'
                WHEN doc_id % 4 = 1 THEN '/?fbclid=AbC123'
                WHEN doc_id % 4 = 2 THEN '#section-3'
                ELSE '/'
              END AS url
  FROM documents
),
s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM messy),
s2 AS (SELECT doc_id,
              lower(regexp_extract(u, '^([^/]*//[^/]*)', 1))
                || regexp_replace(u, '^[^/]*//[^/]*', '') AS u
       FROM s1),
s3 AS (SELECT doc_id,
              regexp_replace(regexp_replace(u, '^([a-z]+://)www\\.', '\\1'),
                             ':(443|80)(/|\\?|$)', '\\2') AS u
       FROM s2),
s4 AS (SELECT doc_id,
              regexp_replace(regexp_replace(u, '{_TRACKING}', '', 'g'),
                             '[?&]$', '') AS u
       FROM s3),
s5 AS (SELECT doc_id, regexp_replace(u, '([^/])/$', '\\1') AS u FROM s4)
SELECT u AS canonical_url,
       min(doc_id) AS keep_doc_id,
       count(*) AS dup_count
FROM s5 GROUP BY u
"""


QUERIES: dict[str, tuple] = {
    "corpus_dsir_weights": (dsir_weights, DSIR_WEIGHTS_SQL),
    "corpus_url_dedup": (url_dedup, URL_DEDUP_SQL),
}
