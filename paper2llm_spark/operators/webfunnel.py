"""Composed web-quality funnel — the FineWeb/RefinedWeb-shaped
selection chain a production crawl pipeline runs end-to-end:

    Gopher rules ∧ C4 line filters ∧ quality classifier
        → exact-dedup canonical → per-domain cap → selected

Each stage is individually hash-verified by its standalone driver query
(``corpus_gopher_rules`` / ``corpus_c4_filters`` /
``text_quality_classifier`` / ``dedup_exact`` / ``corpus_domain_cap``);
this query verifies the COMPOSITION: one row per input document with
every stage flag, the funnel stage that dropped it, and the final
``selected`` bit — the per-document audit trail a curation run must
emit so corpus composition is explainable after the fact.

Plan shape (what matters at 10^12 documents):

* every per-document signal — all five Gopher rule scalars, the C4
  kept-line count over synthesized sentence lines, the hashed-feature
  classifier logit, ``md5(text)`` — is computed in ONE fused scan-side
  projection; the naive compose-by-join (each stage's standalone output
  self-joined on doc_id) would shuffle the corpus four times.
* exact-dedup canonicality is a window ``min`` over ``md5(text)`` —
  the only corpus-wide key exchange, and it carries ~80-byte flag rows,
  never ``text`` (pruned before the shuffle).
* the domain cap is a second short-row exchange on ``source``; rank
  among survivors is a conditional running count, so dropped documents
  ride the same window instead of forcing a survivors-only self-join.
* zero joins anywhere, zero Python.  Asserted in
  ``tests/test_plan_quality.py`` (exactly 3 exchanges: round-robin
  spread of the single local file + the two window exchanges).

Dedup-stage discrimination: the sf corpora carry no exact duplicates
(every ``text`` is distinct), so the funnel input plants deterministic
copies — every ``doc_id % 7 == 0`` document is re-keyed at
``doc_id + 10_000_000`` with identical text/source, in BOTH engines —
the same planted-pair technique ``dedup_embedding_cosine`` uses.  A
copy whose original survives the three filters drops at the
``duplicate`` stage (identical text ⇒ identical flags; the window min
picks the lower original id).

C4 needs line structure the newline-free driver corpus lacks, so lines
are synthesized in-engine exactly like the standalone query — except
the '.'-termination roll hashes the *sentence text* (not doc_id), so
planted copies get byte-identical lines and flags, as identical pages
would in a real crawl.

Funnel split at sf0.01 (572 rows incl. 72 planted dups): 279 gopher /
35 classifier / 36 duplicate / 122 domain_cap / 100 selected.  No
document blocks *at* the c4 stage — every sub-50-word doc that fails
C4's 3-kept-lines floor fails Gopher's 50-word floor first — but the
``c4_keep`` column itself is hash-verified in both polarities
(False=114 / True=458), so the gate is non-vacuous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, portable_hash60, sql_hash60, tokens
from .webquality import (
    C4_MIN_KEPT_LINES,
    C4_MIN_LINE_WORDS,
    C4_SENT_TOKENS,
    GOPHER_ALPHA_FRAC,
    GOPHER_MAX_AVG_LEN,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_AVG_LEN,
    GOPHER_MIN_REQ_STOP,
    GOPHER_MIN_WORDS,
    GOPHER_REQ_STOPWORDS,
    GOPHER_SYMBOL_FRAC,
    QCLF_BUCKETS,
    QCLF_THRESH_MICRO,
    QCLF_WEIGHTS,
    _BUCKET,
    _STOP_IN,
    _W_LIST,
)

# Max selected documents per source after all filters + dedup.  The
# sf0.01 survivor pool is ~7-10 docs/source across 20 sources, so 5
# drops a real tail in every source (non-vacuous in both directions).
FUNNEL_CAP_K = 5
# Planted-duplicate keying: copy every doc_id % DUP_MOD == 0 document.
DUP_MOD = 7
DUP_OFFSET = 10_000_000

_TOK = SQL_TOKENS.format(expr="text")
_LINE_TOK = SQL_TOKENS.format(expr="l")


def funnel_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ planted exact duplicates, spread across cores
    (heavy scan-side scalar work over a single local file)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    dups = docs.filter((F.col("doc_id") % DUP_MOD) == 0).select(
        (F.col("doc_id") + DUP_OFFSET).alias("doc_id"), "source", "text"
    )
    return docs.unionByName(dups).repartition(
        spark.sparkContext.defaultParallelism
    )


def quality_funnel_frame(docs: DataFrame) -> DataFrame:
    """Full funnel over a frame carrying (doc_id, source, text)."""
    staged = docs.select(
        "doc_id", "source", "text", tokens(F.col("text")).alias("toks")
    ).withColumn("w", F.lit(QCLF_WEIGHTS))
    toks = F.col("toks")

    # --- Gopher §A1.1 scalars (webquality.gopher_rules_frame twins) ---
    n_words = F.size(toks).cast("bigint")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("bigint")
    n_sym = F.size(
        F.filter(toks, lambda t: t.startswith("#") | t.contains("..."))
    ).cast("bigint")
    n_stop = sum(
        F.array_contains(toks, w).cast("int") for w in GOPHER_REQ_STOPWORDS
    ).cast("bigint")

    # --- hashed linear classifier (webquality.quality_classifier_frame) ---
    sum_w = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc
        + F.element_at(
            F.col("w"), (portable_hash60(t) % QCLF_BUCKETS).cast("int") + 1
        ),
    )

    # --- C4 synthesized lines (webquality._with_synth_lines, but the
    # punctuation roll hashes the sentence text so identical documents
    # get identical lines) ---
    n_sent = F.expr(
        f"(size(toks) + {C4_SENT_TOKENS - 1}) div {C4_SENT_TOKENS}"
    )
    sent = lambda i: F.array_join(  # noqa: E731
        F.slice(toks, (i - 1) * C4_SENT_TOKENS + 1, C4_SENT_TOKENS), " "
    )
    line = lambda i: F.concat(  # noqa: E731
        sent(i),
        F.when(
            portable_hash60(
                F.concat(sent(i), F.lit(":"), i.cast("string"))
            ) % 4 == 0,
            F.lit(""),
        ).otherwise(F.lit(".")),
    )
    idx = F.filter(F.sequence(F.lit(0), n_sent), lambda i: i >= 1)

    scalars = staged.select(
        "doc_id",
        "source",
        n_words.alias("n_words"),
        sum_len.alias("sum_len"),
        n_alpha.alias("n_alpha"),
        n_sym.alias("n_sym"),
        n_stop.alias("n_stop"),
        sum_w.alias("sum_w"),
        # staged as a bound attribute before reuse: HOF lambdas get no CSE
        F.transform(idx, line).alias("lines"),
        F.lower(F.col("text")).contains("lorem ipsum").alias("has_lorem"),
        F.lower(F.col("text")).contains("{").alias("has_brace"),
        F.md5("text").alias("content_md5"),
    )

    kept_lines = F.size(
        F.filter(
            F.col("lines"),
            lambda l: l.rlike('[.!?"]$')
            & (F.size(tokens(l)) >= C4_MIN_LINE_WORDS),
        )
    )
    a_num, a_den = GOPHER_ALPHA_FRAC
    s_num, s_den = GOPHER_SYMBOL_FRAC
    gopher_keep = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("sum_len") >= GOPHER_MIN_AVG_LEN * F.col("n_words"))
        & (F.col("sum_len") <= GOPHER_MAX_AVG_LEN * F.col("n_words"))
        & (a_den * F.col("n_alpha") >= a_num * F.col("n_words"))
        & (s_den * F.col("n_sym") <= s_num * F.col("n_words"))
        & (F.col("n_stop") >= GOPHER_MIN_REQ_STOP)
    )
    c4_keep = (
        (kept_lines >= C4_MIN_KEPT_LINES)
        & ~F.col("has_lorem")
        & ~F.col("has_brace")
    )
    clf_keep = F.col("sum_w") >= QCLF_THRESH_MICRO * F.col("n_words")
    logit = F.when(F.col("n_words") == 0, F.lit(0.0)).otherwise(
        F.floor(F.col("sum_w") / 1000000.0 / F.col("n_words") * 10000 + 0.5)
        / 10000
    )

    flagged = scalars.select(
        "doc_id",
        "source",
        "n_words",
        "content_md5",
        logit.alias("logit"),
        gopher_keep.alias("gopher_keep"),
        c4_keep.alias("c4_keep"),
        clf_keep.alias("clf_keep"),
        (gopher_keep & c4_keep & clf_keep).alias("candidate"),
    )

    # window 1: exact-dedup canonical among candidates (one exchange on
    # the digest; rows reaching the 'duplicate' test are candidates, so
    # canon_id is never NULL where it is compared)
    canon = F.min(
        F.when(F.col("candidate"), F.col("doc_id"))
    ).over(Window.partitionBy("content_md5"))
    dd = flagged.withColumn("canon_id", canon).withColumn(
        "dedup_keep", F.col("candidate") & (F.col("doc_id") == F.col("canon_id"))
    )

    # window 2: rank among survivors per source — a conditional running
    # count, so dropped rows ride the same window (no survivors-only
    # self-join)
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("logit").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = dd.withColumn(
        "rk", F.sum(F.col("dedup_keep").cast("int")).over(w).cast("bigint")
    )

    stage = (
        F.when(~F.col("gopher_keep"), "gopher")
        .when(~F.col("c4_keep"), "c4")
        .when(~F.col("clf_keep"), "classifier")
        .when(F.col("doc_id") != F.col("canon_id"), "duplicate")
        .when(F.col("rk") > FUNNEL_CAP_K, "domain_cap")
        .otherwise("selected")
    )
    return ranked.select(
        "doc_id",
        "source",
        "n_words",
        "logit",
        "gopher_keep",
        "c4_keep",
        "clf_keep",
        F.coalesce("canon_id", F.lit(-1)).cast("bigint").alias("canon_id"),
        "rk",
        stage.alias("stage"),
        (F.col("dedup_keep") & (F.col("rk") <= FUNNEL_CAP_K)).alias(
            "selected"
        ),
    )


def quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_funnel_frame(funnel_input(spark, sf_dir))


_SENT = f"array_to_string(tok[((i-1)*{C4_SENT_TOKENS}+1):(i*{C4_SENT_TOKENS})], ' ')"
_SYNTH_LINE = (
    f"{_SENT} || (CASE WHEN {sql_hash60(f'{_SENT} || chr(58) || i')} % 4 = 0"
    f" THEN '' ELSE '.' END)"
)

QUALITY_FUNNEL_SQL = f"""
WITH base AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + {DUP_OFFSET} AS doc_id, source, text
  FROM documents WHERE doc_id % {DUP_MOD} = 0
),
t AS (
  SELECT doc_id, source, text, {_TOK} AS tok FROM base
),
m AS (
  SELECT doc_id, source,
         len(tok)::BIGINT AS n_words,
         coalesce(list_sum(list_transform(tok, x -> length(x))),
                  0)::BIGINT AS sum_len,
         len(list_filter(tok, x -> regexp_matches(x, '[a-z]')))::BIGINT
           AS n_alpha,
         len(list_filter(tok, x -> starts_with(x, '#')
                                   OR contains(x, '...')))::BIGINT AS n_sym,
         (SELECT count(DISTINCT w) FROM unnest(tok) AS u(w)
          WHERE w IN ({_STOP_IN}))::BIGINT AS n_stop,
         coalesce(list_sum(list_transform(tok,
                     x -> ({_W_LIST})[{_BUCKET} + 1])), 0)::BIGINT AS sum_w,
         list_transform(range(1, (len(tok) + {C4_SENT_TOKENS - 1})
                                 // {C4_SENT_TOKENS} + 1),
                        i -> {_SYNTH_LINE}) AS lines,
         contains(lower(text), 'lorem ipsum') AS has_lorem,
         contains(lower(text), '{{') AS has_brace,
         md5(text) AS content_md5
  FROM t
),
f AS (
  SELECT doc_id, source, n_words, content_md5,
         CASE WHEN n_words = 0 THEN 0.0
              ELSE floor(sum_w / 1000000.0 / n_words * 10000 + 0.5) / 10000
         END AS logit,
         (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
          AND sum_len >= {GOPHER_MIN_AVG_LEN} * n_words
          AND sum_len <= {GOPHER_MAX_AVG_LEN} * n_words
          AND {GOPHER_ALPHA_FRAC[1]} * n_alpha
              >= {GOPHER_ALPHA_FRAC[0]} * n_words
          AND {GOPHER_SYMBOL_FRAC[1]} * n_sym
              <= {GOPHER_SYMBOL_FRAC[0]} * n_words
          AND n_stop >= {GOPHER_MIN_REQ_STOP}) AS gopher_keep,
         (len(list_filter(lines,
               l -> regexp_matches(l, '[.!?"]$')
                    AND len({_LINE_TOK}) >= {C4_MIN_LINE_WORDS}))
            >= {C4_MIN_KEPT_LINES}
          AND NOT has_lorem AND NOT has_brace) AS c4_keep,
         (sum_w >= {QCLF_THRESH_MICRO} * n_words) AS clf_keep
  FROM m
),
c AS (
  SELECT *, (gopher_keep AND c4_keep AND clf_keep) AS candidate FROM f
),
d AS (
  SELECT *,
         min(CASE WHEN candidate THEN doc_id END)
           OVER (PARTITION BY content_md5) AS canon_id
  FROM c
),
e AS (
  SELECT *, (candidate AND doc_id = canon_id) AS dedup_keep FROM d
),
r AS (
  SELECT *,
         sum(CASE WHEN dedup_keep THEN 1 ELSE 0 END)
           OVER (PARTITION BY source ORDER BY logit DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
           AS rk
  FROM e
)
SELECT doc_id, source, n_words, logit,
       gopher_keep, c4_keep, clf_keep,
       coalesce(canon_id, -1)::BIGINT AS canon_id,
       rk,
       CASE WHEN NOT gopher_keep THEN 'gopher'
            WHEN NOT c4_keep THEN 'c4'
            WHEN NOT clf_keep THEN 'classifier'
            WHEN doc_id <> canon_id THEN 'duplicate'
            WHEN rk > {FUNNEL_CAP_K} THEN 'domain_cap'
            ELSE 'selected' END AS stage,
       (dedup_keep AND rk <= {FUNNEL_CAP_K}) AS selected
FROM r
"""


QUERIES: dict[str, tuple] = {
    "corpus_quality_funnel": (quality_funnel, QUALITY_FUNNEL_SQL),
}
