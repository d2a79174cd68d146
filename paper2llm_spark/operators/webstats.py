"""Web-scale corpus statistics and temporal operators (SURVEY.md §2.11).

Four families a 100 TB training-data pipeline needs beyond dedup/ANN:

* **Repetition quality stats** (Gopher-style, Rae et al. 2021 §A1.1):
  duplicate-unigram fraction and top-2/3-gram coverage per document.
  Scalable plan: tag each n-gram with its order, explode ONCE, then two
  map-side-combinable aggregations — per-(doc, n, gram) counts, then
  per-doc max/sum. Linear in corpus size; never materializes a
  per-doc frequency map wider than one gram row.
* **Test-set decontamination** (GPT-3 appendix C / Llama style n-gram
  overlap): hash every document's word 4-grams and count hits against a
  broadcast benchmark gram set. The benchmark side is tiny by
  construction (eval suites are MBs, corpora are TBs), so the join MUST
  be a broadcast hash join — asserted in tests/test_plan_quality.py.
* **Sessionization** over the events table: gap-based session breaks via
  lag + running sum, ONE shuffle on user_id.
* **As-of join** (nearest prior purchase per click): the scalable
  union + last(ignorenulls) window formulation — one shuffle on
  user_id, no range-join row explosion. The DuckDB dual uses the native
  ASOF LEFT JOIN, making it an independent oracle for the semantics.
* **Stratified sampling**: deterministic per-language rates off the
  portable 60-bit md5 hash; pure scan-side filter, zero shuffles.

Every query has a DuckDB dual with identical column names and types;
doubles use the engine-identical floor(x*1e4+0.5)/1e4 half-up rounding
(see operators/textstats.py).
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

SESSION_GAP_US = 1_800_000_000  # 30 min, microseconds
CONTAM_N = 4        # n-gram order for decontamination
BENCH_MOD = 97      # doc_id % BENCH_MOD == 0 -> benchmark ("eval") set
SAMPLE_RATES = {"en": 500, "de": 400, "fr": 300, "es": 200}  # per-mille
SAMPLE_DEFAULT = 100


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-file local scan -> spread; a cluster scan already has splits
    return spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _round4(col: Column) -> Column:
    # identical half-up rounding in Spark and DuckDB (round() disagrees
    # on decimal-tie doubles between the engines)
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


# ---------------------------------------------------------------------------
# Gopher-style repetition statistics
# ---------------------------------------------------------------------------

def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicate-unigram fraction + top-2/3-gram coverage.

    One explode over (n, gram) tagged structs, then two hash
    aggregations — both keep their map-side partial phase, so the only
    corpus-sized shuffle carries (doc_id, n, gram, partial_count) rows.
    """
    docs = _docs(spark, sf_dir).select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    def _tag(n: int):
        # one-arg lambda on purpose: a two-arg lambda would receive the
        # element INDEX from F.transform as its second argument
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    tagged = F.flatten(
        F.array(
            *[
                F.transform(word_ngrams(F.col("toks"), n), _tag(n))
                for n in (1, 2, 3)
            ]
        )
    )
    exploded = docs.select(
        "doc_id", F.explode(tagged).alias("g")
    ).select("doc_id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    counts = exploded.groupBy("doc_id", "n", "gram").agg(
        F.count("*").alias("cnt")
    )
    stats = counts.groupBy("doc_id").agg(
        F.sum(F.when(F.col("n") == 1, F.col("cnt"))).alias("n_tokens"),
        F.count(F.when(F.col("n") == 1, F.lit(1))).alias("n_distinct"),
        F.max(F.when(F.col("n") == 2, F.col("cnt"))).alias("top2"),
        F.max(F.when(F.col("n") == 3, F.col("cnt"))).alias("top3"),
    )
    nt = F.col("n_tokens")
    return stats.select(
        "doc_id",
        nt.cast("bigint").alias("n_tokens"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        _round4(F.lit(1.0) - F.col("n_distinct") / nt).alias(
            "dup_unigram_frac"
        ),
        _round4(
            F.coalesce(F.lit(2) * F.col("top2") / nt, F.lit(0.0))
        ).alias("top_bigram_frac"),
        _round4(
            F.coalesce(F.lit(3) * F.col("top3") / nt, F.lit(0.0))
        ).alias("top_trigram_frac"),
    )


_TOK = SQL_TOKENS.format(expr="text")

REPETITION_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOK} AS tok FROM documents),
g AS (
  SELECT doc_id, 1 AS n, unnest(tok) AS gram FROM toks
  UNION ALL
  SELECT doc_id, 2 AS n, unnest({sql_ngrams('tok', 2)}) AS gram FROM toks
  UNION ALL
  SELECT doc_id, 3 AS n, unnest({sql_ngrams('tok', 3)}) AS gram FROM toks
),
c AS (SELECT doc_id, n, gram, count(*) AS cnt FROM g GROUP BY 1, 2, 3),
s AS (
  SELECT doc_id,
         sum(CASE WHEN n = 1 THEN cnt END) AS n_tokens,
         count(CASE WHEN n = 1 THEN 1 END) AS n_distinct,
         max(CASE WHEN n = 2 THEN cnt END) AS top2,
         max(CASE WHEN n = 3 THEN cnt END) AS top3
  FROM c GROUP BY doc_id
)
SELECT doc_id,
       n_tokens::BIGINT AS n_tokens,
       n_distinct::BIGINT AS n_distinct,
       floor((1.0 - n_distinct / n_tokens) * 10000 + 0.5) / 10000 AS dup_unigram_frac,
       floor(coalesce(2 * top2 / n_tokens, 0.0) * 10000 + 0.5) / 10000 AS top_bigram_frac,
       floor(coalesce(3 * top3 / n_tokens, 0.0) * 10000 + 0.5) / 10000 AS top_trigram_frac
FROM s
"""


# ---------------------------------------------------------------------------
# test-set decontamination (n-gram overlap vs a benchmark set)
# ---------------------------------------------------------------------------

def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per corpus doc: distinct 4-gram count, hits against the benchmark
    gram set, contaminated flag.

    The benchmark set (docs with doc_id % 97 == 0, standing in for an
    eval suite) is grams-distinct and tiny relative to the corpus, so it
    is explicitly broadcast; the corpus side streams through one explode
    + broadcast-hash-join + one groupBy. n-grams travel as the portable
    60-bit md5 hash, not strings — the shuffled row is 16 bytes, not a
    40-char shingle.
    """
    docs = _docs(spark, sf_dir).select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    gram_hashes = F.array_distinct(
        F.transform(
            word_ngrams(F.col("toks"), CONTAM_N), lambda g: portable_hash60(g)
        )
    )
    bench = (
        docs.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select(F.explode(gram_hashes).alias("gh"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corp = docs.filter(F.col("doc_id") % BENCH_MOD != 0).select(
        "doc_id", gram_hashes.alias("ghs")
    )
    ex = corp.select(
        "doc_id",
        F.size("ghs").cast("bigint").alias("n_grams"),
        F.explode_outer("ghs").alias("gh"),
    )
    joined = ex.join(F.broadcast(bench), "gh", "left")
    agg = joined.groupBy("doc_id").agg(
        F.max("n_grams").alias("n_grams"),
        F.count("hit").alias("n_hits"),
    )
    return agg.select(
        "doc_id",
        "n_grams",
        "n_hits",
        (F.col("n_hits") > 0).alias("contaminated"),
    )


_GH = sql_hash60("gram")

DECONTAMINATE_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOK} AS tok FROM documents),
g AS (
  SELECT doc_id, {_GH} AS gh
  FROM (SELECT doc_id, unnest({sql_ngrams('tok', CONTAM_N)}) AS gram FROM toks)
  GROUP BY doc_id, gh
),
bench AS (SELECT DISTINCT gh FROM g WHERE doc_id % {BENCH_MOD} = 0),
corp AS (SELECT doc_id, gh FROM g WHERE doc_id % {BENCH_MOD} != 0),
ngrams AS (
  SELECT doc_id, count(*) AS n_grams FROM corp GROUP BY doc_id
),
hits AS (
  SELECT c.doc_id, count(*) AS n_hits
  FROM corp c JOIN bench b USING (gh)
  GROUP BY c.doc_id
)
SELECT b.doc_id,
       coalesce(n.n_grams, 0)::BIGINT AS n_grams,
       coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % {BENCH_MOD} != 0) b
LEFT JOIN ngrams n USING (doc_id)
LEFT JOIN hits h USING (doc_id)
"""


# ---------------------------------------------------------------------------
# sessionization over the events table
# ---------------------------------------------------------------------------

def sessionize_frame(ev: DataFrame) -> DataFrame:
    """Gap-based sessions (30 min): lag + running sum over ONE window
    shuffle on user_id; per-session rollup keeps its map-side partial.
    value sums travel as exact bigint micro-units so the two engines
    agree bit-for-bit regardless of float summation order."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # interval arithmetic, not unix_micros: ts is TIMESTAMP_NTZ and the
    # difference of two NTZ stamps is timezone-free in both engines
    prev = F.lag("ts").over(w)
    brk = F.when(
        prev.isNull()
        | ((F.col("ts") - prev) > F.expr("INTERVAL '30' MINUTE")),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = ev.withColumn(
        "session_id",
        F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (
            F.sum(F.floor(F.col("value") * 1000000 + F.lit(0.5)))
            / F.lit(1000000.0)
        ).alias("sum_value"),
    )


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize_frame(_events(spark, sf_dir))


SESSIONIZE_SQL = f"""
WITH o AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
)
SELECT user_id,
       session_id::BIGINT AS session_id,
       count(*)::BIGINT AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       sum(floor(value * 1000000 + 0.5))::BIGINT / 1000000.0 AS sum_value
FROM s GROUP BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# as-of join: each click -> nearest prior-or-equal purchase per user
# ---------------------------------------------------------------------------

def asof_join_frame(ev: DataFrame) -> DataFrame:
    """Scalable as-of join: union the two streams, sort within user by
    (ts, side), and carry the latest right row forward with
    last(ignorenulls). One shuffle on user_id, output size == left size
    — never the O(|L| * |R per key|) blowup of a naive range join.

    Right rows sort BEFORE left rows at equal ts (side 0 < 1) to match
    DuckDB's ASOF `l.ts >= r.ts` inclusive semantics. No explicit
    right-side dedup is needed: the (ts, side, event_id) ordering makes
    last(ignorenulls) pick the max-event_id purchase at the latest
    eligible ts — the same row DuckDB's ASOF sees after its dedup —
    keeping the whole operator at ONE exchange.
    """
    right = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("ts"),
        F.lit(0).alias("side"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.col("event_id").alias("r_id"),
        F.col("ts").alias("r_ts"),
    )
    left = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast("bigint").alias("r_id"),
        F.lit(None).cast("timestamp").alias("r_ts"),
    )
    w = Window.partitionBy("user_id").orderBy(
        "ts", "side", "event_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged = left.unionByName(right).select(
        "user_id",
        "ts",
        "side",
        "event_id",
        F.last("r_id", ignorenulls=True).over(w).alias("purchase_id"),
        F.last("r_ts", ignorenulls=True).over(w).alias("purchase_ts"),
    )
    # NULL-free output: clicks with no prior purchase carry sentinel
    # (-1, epoch) instead of NULLs — a nullable bigint column round-trips
    # through Arrow/pandas as float64 and breaks cross-engine hashing
    return merged.filter(F.col("side") == 1).select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
        F.coalesce("purchase_id", F.lit(-1)).alias("purchase_id"),
        F.coalesce(
            "purchase_ts", F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'")
        ).alias("purchase_ts"),
    )


def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return asof_join_frame(_events(spark, sf_dir))


ASOF_JOIN_SQL = """
WITH r AS (
  SELECT user_id, ts, event_id FROM (
    SELECT user_id, ts, event_id,
           row_number() OVER (PARTITION BY user_id, ts
                              ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase'
  ) WHERE rn = 1
),
l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT l.event_id AS click_id,
       l.user_id AS user_id,
       l.ts AS click_ts,
       coalesce(r.event_id, -1) AS purchase_id,
       coalesce(r.ts, TIMESTAMP '1970-01-01 00:00:00') AS purchase_ts
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


# ---------------------------------------------------------------------------
# deterministic stratified sampling
# ---------------------------------------------------------------------------

def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sampling rates off the portable md5 hash — a pure
    scan-side filter (zero shuffles, pushes the lang column read down to
    the parquet scan), reproducible across engines and reruns."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bucket = portable_hash60(
        F.concat(F.lit("strat|"), F.col("doc_id").cast("string"))
    ) % 1000
    rate = F.lit(SAMPLE_DEFAULT)
    for lang, r in SAMPLE_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return (
        docs.select(
            "doc_id", "lang", bucket.cast("bigint").alias("strat_bucket")
        )
        .filter(F.col("strat_bucket") < rate)
    )


_RATE_CASE = " ".join(
    f"WHEN lang = '{lang}' THEN {r}" for lang, r in SAMPLE_RATES.items()
)

STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang, strat_bucket
FROM (
  SELECT doc_id, lang,
         {sql_hash60("'strat|' || doc_id")} % 1000 AS strat_bucket
  FROM documents
)
WHERE strat_bucket < (CASE {_RATE_CASE} ELSE {SAMPLE_DEFAULT} END)
"""


# ---------------------------------------------------------------------------
# ordered funnel (view -> click -> purchase)
# ---------------------------------------------------------------------------

_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def funnel_frame(ev: DataFrame) -> DataFrame:
    """Per-user ordered funnel: first view, first click strictly after
    that view, first purchase strictly after that click.

    ONE shuffle on user_id: the per-user event sequence is sorted
    (collect_list + array_sort) and walked with a single fold — the
    sequence-match semantics (step k+1 must come after the COMPLETED
    step k) are not expressible as independent min() aggregates, but the
    fold keeps them inside one map-side-combinable aggregation. Per-user
    arrays are bounded by user activity (production caps with a slice).

    Tie semantics are INCLUSIVE (an event at exactly the prior step's
    timestamp advances the funnel): the sort key is (ts, funnel_rank),
    so at equal ts the earlier step is folded first — matched by the
    dual's `>=` comparisons.

    Missing steps emit the epoch sentinel instead of NULL timestamps
    (nullable columns round-trip poorly through Arrow; same convention
    as asof_join_frame).
    """
    rk = (
        F.when(F.col("event_type") == "view", 0)
        .when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "purchase", 2)
        .otherwise(3)
    )
    per_user = (
        ev.select("user_id", "ts", rk.alias("rk"))
        .groupBy("user_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("ts", "rk"))).alias("evs")
        )
    )
    init = F.struct(
        F.lit(None).cast("timestamp").alias("t1"),
        F.lit(None).cast("timestamp").alias("t2"),
        F.lit(None).cast("timestamp").alias("t3"),
    )
    walked = F.aggregate(
        "evs",
        init,
        lambda acc, e: F.struct(
            F.coalesce(
                acc["t1"], F.when(e["rk"] == 0, e["ts"])
            ).alias("t1"),
            F.coalesce(
                acc["t2"],
                F.when((e["rk"] == 1) & acc["t1"].isNotNull(), e["ts"]),
            ).alias("t2"),
            F.coalesce(
                acc["t3"],
                F.when((e["rk"] == 2) & acc["t2"].isNotNull(), e["ts"]),
            ).alias("t3"),
        ),
    )
    return per_user.select("user_id", walked.alias("f")).select(
        "user_id",
        F.coalesce(F.col("f.t1"), F.expr(_EPOCH)).alias("view_ts"),
        F.coalesce(F.col("f.t2"), F.expr(_EPOCH)).alias("click_ts"),
        F.coalesce(F.col("f.t3"), F.expr(_EPOCH)).alias("purchase_ts"),
        F.col("f.t3").isNotNull().alias("converted"),
    )


def funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_frame(_events(spark, sf_dir))


# The dual states the same semantics relationally: min view, min click
# at-or-after it, min purchase at-or-after that. Equivalence with the
# fold: at equal ts the (ts, funnel_rank) sort folds the earlier step
# first, so an equal-ts event of the NEXT step advances — exactly the
# inclusive `>=`.
FUNNEL_SQL = """
WITH base AS (SELECT DISTINCT user_id FROM events),
t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts >= t1.t1
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= t2.t2
  GROUP BY e.user_id
)
SELECT b.user_id,
       coalesce(t1.t1, TIMESTAMP '1970-01-01 00:00:00') AS view_ts,
       coalesce(t2.t2, TIMESTAMP '1970-01-01 00:00:00') AS click_ts,
       coalesce(t3.t3, TIMESTAMP '1970-01-01 00:00:00') AS purchase_ts,
       t3.t3 IS NOT NULL AS converted
FROM base b
LEFT JOIN t1 ON b.user_id = t1.user_id
LEFT JOIN t2 ON b.user_id = t2.user_id
LEFT JOIN t3 ON b.user_id = t3.user_id
"""


QUERIES: dict[str, tuple] = {
    "text_repetition_stats": (repetition_stats, REPETITION_SQL),
    "decontaminate_ngram_overlap": (decontaminate, DECONTAMINATE_SQL),
    "events_sessionize": (sessionize, SESSIONIZE_SQL),
    "events_asof_join": (asof_join, ASOF_JOIN_SQL),
    "events_funnel": (funnel, FUNNEL_SQL),
    "corpus_stratified_sample": (stratified_sample, STRATIFIED_SAMPLE_SQL),
}
