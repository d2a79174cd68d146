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

from pyspark.sql import Column, DataFrame, SparkSession, Window
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
    # source AND target bucket counts in ONE map-side-combinable pass
    # (the target count is a conditional agg, not a second corpus scan)
    counts = grams.groupBy("b").agg(
        F.count("*").alias("cs"),
        F.count(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1)
        ).alias("ct"),
    )
    totals = counts.agg(
        F.sum("cs").alias("ts"), F.sum("ct").alias("tt")
    )
    # bucket log-ratio in exact micro-nats; identical expression shape in
    # the dual so the doubles agree bit-for-bit before the floor
    lr = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.floor(
                F.log(
                    ((F.col("ct") + F.lit(1.0))
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
counts AS (
  SELECT b, count(*) AS cs,
         count(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}') AS ct
  FROM grams GROUP BY b
),
totals AS (SELECT sum(cs) AS ts, sum(ct) AS tt FROM counts),
lr AS (
  SELECT b,
         floor(ln(((ct + 1.0) / (tt + {float(DSIR_BUCKETS)}))
                  / ((cs + 1.0) / (ts + {float(DSIR_BUCKETS)})))
               * 1000000 + 0.5)::BIGINT AS lr_micro
  FROM counts CROSS JOIN totals
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
# www-prefixes to strip. doc_id % 40 collides with the testdata's
# source = doc_id % 20 layout, so (source, path) groups really contain
# multiple docs; the variant selector (doc_id // 40) % 4 CYCLES within
# each group, so groups merge across DIFFERENT raw forms (fragment vs
# tracking-param vs slash variants) — grouping only happens if the
# canonicalizer actually normalized them — while the ?ref=home variant
# stays a distinct canonical URL (non-tracking params survive)
URL_PATH_MOD = 40

_TRACKING = r"(utm_[a-z]+|fbclid|gclid)=[^&#]*&?"


def _messy_url(doc_id: Column, source: Column) -> Column:
    variant = F.floor(doc_id / URL_PATH_MOD).cast("bigint") % 4
    return F.concat(
        F.lit("HTTPS://WWW."),
        source,
        F.lit(".Example.COM:443/Articles/"),
        (doc_id % URL_PATH_MOD).cast("string"),
        F.when(variant == 0, F.lit("?utm_source=feed&utm_campaign=x&ref=home"))
        .when(variant == 1, F.lit("/?fbclid=AbC123"))
        .when(variant == 2, F.lit("#section-3"))
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
                WHEN (doc_id // {URL_PATH_MOD}) % 4 = 0
                  THEN '?utm_source=feed&utm_campaign=x&ref=home'
                WHEN (doc_id // {URL_PATH_MOD}) % 4 = 1 THEN '/?fbclid=AbC123'
                WHEN (doc_id // {URL_PATH_MOD}) % 4 = 2 THEN '#section-3'
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


# ---------------------------------------------------------------------------
# sequence packing (training-loader layout)
# ---------------------------------------------------------------------------

CTX_TOKENS = 128     # training sequence length (production: 2k-8k)
N_PACK_SHARDS = 8    # parallel packing streams


def sequence_pack_frame(docs: DataFrame) -> DataFrame:
    """GPT-style concat-then-chunk packing plan: documents are
    concatenated in deterministic order and cut into CTX_TOKENS
    sequences; each doc learns which sequence it starts in and at what
    offset.

    A single global running sum would serialize the corpus through one
    window partition — the scale shape packs WITHIN N_PACK_SHARDS
    independent streams (hash-assigned), so the plan is ONE exchange on
    shard + a per-shard sort; every shard's packing is embarrassingly
    parallel, exactly how a multi-worker training loader shards its
    input. Sequence ids are (shard, seq_idx) so they never collide
    across streams.
    """
    from pyspark.sql import Window

    t = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
        (portable_hash60(F.col("doc_id").cast("string")) % N_PACK_SHARDS)
        .alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = t.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("cum_before"),
    )
    return cum.select(
        "doc_id",
        "shard",
        "n_tokens",
        (F.col("cum_before") / CTX_TOKENS).cast("bigint").alias("seq_idx"),
        (F.col("cum_before") % CTX_TOKENS).alias("seq_offset"),
    )


def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the first real step is the shard exchange; no spread needed
    return sequence_pack_frame(_docs(spark, sf_dir, spread=False))


SEQUENCE_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id,
         len({_TOK})::BIGINT AS n_tokens,
         {sql_hash60("doc_id::VARCHAR")} % {N_PACK_SHARDS} AS shard
  FROM documents
),
cum AS (
  SELECT doc_id, shard, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t
)
SELECT doc_id, shard, n_tokens,
       (cum_before // {CTX_TOKENS})::BIGINT AS seq_idx,
       (cum_before % {CTX_TOKENS})::BIGINT AS seq_offset
FROM cum
"""


# ---------------------------------------------------------------------------
# mixture plan (per-language sampling rates toward a target blend)
# ---------------------------------------------------------------------------

# target language shares for the training blend (The-Pile/LLaMA-style
# mixture table; literal config, swapped per run)
MIXTURE_TARGET = {"en": 0.55, "de": 0.15, "fr": 0.15, "es": 0.10, "zh": 0.05}
MIXTURE_BUDGET_TOKENS = 20_000  # total token budget of the blend


def mixture_plan_frame(docs: DataFrame) -> DataFrame:
    """Per-language sampling plan: rate = min(1, target_tokens /
    available_tokens).  One map-side-combinable agg collapses the corpus
    to |langs| rows; the target table is a literal.  The emitted rates
    feed the stratified sampler (webstats.stratified_sample) as its
    per-language keep probabilities."""
    avail = docs.select(
        "lang", F.size(tokens(F.col("text"))).cast("bigint").alias("n")
    ).groupBy("lang").agg(F.sum("n").alias("avail_tokens"))
    target = F.create_map(
        *[x for k, v in sorted(MIXTURE_TARGET.items()) for x in (F.lit(k), F.lit(v))]
    )
    plan = avail.select(
        "lang",
        "avail_tokens",
        F.coalesce(target[F.col("lang")], F.lit(0.0)).alias("target_share"),
    ).select(
        "lang",
        "avail_tokens",
        "target_share",
        F.floor(F.col("target_share") * MIXTURE_BUDGET_TOKENS).cast("bigint").alias(
            "target_tokens"
        ),
    )
    return plan.select(
        "lang",
        "avail_tokens",
        "target_share",
        "target_tokens",
        _round4(
            F.least(
                F.lit(1.0),
                F.col("target_tokens") / F.col("avail_tokens"),
            )
        ).alias("sample_rate"),
    )


def mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixture_plan_frame(_docs(spark, sf_dir, spread=False))


_MIX_CASE = " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in sorted(MIXTURE_TARGET.items())
)

MIXTURE_PLAN_SQL = f"""
WITH avail AS (
  SELECT lang, sum(len({_TOK}))::BIGINT AS avail_tokens
  FROM documents GROUP BY lang
),
plan AS (
  SELECT lang, avail_tokens,
         CASE lang {_MIX_CASE} ELSE 0.0 END AS target_share,
         floor((CASE lang {_MIX_CASE} ELSE 0.0 END) * {MIXTURE_BUDGET_TOKENS})::BIGINT
           AS target_tokens
  FROM avail
)
SELECT lang, avail_tokens, target_share, target_tokens,
       floor(least(1.0, target_tokens / avail_tokens) * 10000 + 0.5) / 10000
         AS sample_rate
FROM plan
"""


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis–Spirakis A-Res)
# ---------------------------------------------------------------------------

WS_SAMPLE_K = 100


def weighted_sample_frame(docs: DataFrame, k: int = WS_SAMPLE_K) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement, probability
    proportional to token count (the token-budget sampling step of
    mixture construction — longer documents proportionally likelier).

    Efraimidis & Spirakis 2006 ("Weighted random sampling with a
    reservoir"): give item i the key ``u_i^(1/w_i)`` with u_i uniform
    and keep the k largest keys — a one-pass, shuffle-free selection
    whose top-k IS a weighted sample without replacement.  This is THE
    cluster-friendly WR sampler: no sequential reservoir, no global
    state; Spark compiles the orderBy+limit into
    ``TakeOrderedAndProject`` (per-partition top-k, merge at the
    driver), so at 10^12 documents nothing shuffles but k rows per
    partition.

    Exactness: u_i comes from the portable 60-bit hash (no RNG), and
    the ordering key uses ``ln(u)/w`` (monotone in u^(1/w)) with ln in
    exact micro-nats — ``floor(ln(u)·1e6+0.5)::BIGINT / w`` — so both
    engines order by the same double of two exact integers;
    ``doc_id`` breaks exact ties.  Rank is re-derived AFTER the limit
    over k rows (tiny), never as a corpus-wide window.
    """
    u = portable_hash60(
        F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))
    ) / F.lit(float(1 << 60))
    w = F.greatest(F.size(tokens(F.col("text"))).cast("bigint"), F.lit(1))
    key_micro = F.floor(F.log(u) * 1000000 + F.lit(0.5)).cast("bigint")
    scored = docs.select(
        "doc_id", "lang",
        w.alias("weight_toks"),
        (key_micro / w).alias("es_key"),
    )
    top = scored.orderBy(
        F.col("es_key").desc(), F.col("doc_id")
    ).limit(k)
    rank_w = Window.orderBy(F.col("es_key").desc(), F.col("doc_id"))
    return top.select(
        F.row_number().over(rank_w).cast("bigint").alias("sample_rank"),
        "doc_id", "lang", "weight_toks",
        _round4(F.col("es_key")).alias("es_key"),
    )


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weighted_sample_frame(_docs(spark, sf_dir))


_WS_U = f"(({sql_hash60(chr(39) + 'ws:' + chr(39) + ' || doc_id')}) / {float(1 << 60)})"

WEIGHTED_SAMPLE_SQL = f"""
WITH scored AS (
  SELECT doc_id, lang,
         greatest(len({_TOK})::BIGINT, 1) AS weight_toks,
         floor(ln({_WS_U}) * 1000000 + 0.5)::BIGINT
           / greatest(len({_TOK})::BIGINT, 1) AS es_key
  FROM documents
),
top AS (
  SELECT * FROM scored ORDER BY es_key DESC, doc_id LIMIT {WS_SAMPLE_K}
)
SELECT row_number() OVER (ORDER BY es_key DESC, doc_id) AS sample_rank,
       doc_id, lang, weight_toks,
       floor(es_key * 10000 + 0.5) / 10000 AS es_key
FROM top
"""


QUERIES: dict[str, tuple] = {
    "corpus_dsir_weights": (dsir_weights, DSIR_WEIGHTS_SQL),
    "corpus_weighted_sample": (weighted_sample, WEIGHTED_SAMPLE_SQL),
    "corpus_url_dedup": (url_dedup, URL_DEDUP_SQL),
    "corpus_sequence_pack": (sequence_pack, SEQUENCE_PACK_SQL),
    "corpus_mixture_plan": (mixture_plan, MIXTURE_PLAN_SQL),
}
