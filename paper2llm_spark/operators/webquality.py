"""Document-quality rule batteries (SURVEY.md §2.11).

Two more filters every web-scale training-data pipeline runs between
crawl and tokenizer, each expressed so the whole battery is ONE
codegen'd projection — zero joins, zero exchanges, the text column
read once:

* **Gopher quality rules** (Rae et al. 2021, "Scaling Language Models:
  Methods, Analysis & Insights from Training Gopher", §A1.1 heuristics)
  — per-document word count / mean word length / alphabetic-word ratio
  / required-stopword / symbol-ratio gates.  Every bound is evaluated
  as an exact integer cross-product comparison (``sum_len >= 3 *
  n_words`` instead of ``sum_len / n_words >= 3``) so the keep decision
  is bit-identical across engines with no float rounding anywhere; the
  reported ratios use the engine-identical ``floor(x*1e4+0.5)/1e4``
  half-up rounding.
* **C4 line filters** (Raffel et al. 2020, §2.2 heuristics) — keep
  lines that end in terminal punctuation AND carry >= 5 words; drop
  pages with fewer than 3 surviving lines, a ``lorem ipsum`` marker, or
  a ``{`` (code).  Lines live in an array column, so the whole filter
  is `filter`/`transform` lambdas over ``split(text, '\\n')`` in the
  scan task: at 10^12 documents this is embarrassingly parallel with
  no shuffle at all — the plan a line-level explode+regroup would
  needlessly pay two exchanges for.

The driver corpus has no newlines or punctuation, so the registered C4
query first synthesizes the line structure *in-engine* (8-token
sentences, a deterministic 75% of which end in '.') — the same
SQL-templated-corpus technique the flagship pipeline oracle uses
(``__spark_entry__._EXTRACT_PIPELINE_SQL``): both engines derive
byte-identical line arrays from ``documents.text``, so the filter is
exercised on discriminating input (some lines drop for missing
punctuation, some for word count, some docs drop wholesale) instead of
passing vacuously.

Every query has a DuckDB dual with identical column names/values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, portable_hash60, sql_hash60, tokens

# Gopher §A1.1 bounds
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_AVG_LEN = 3      # mean word length in [3, 10]
GOPHER_MAX_AVG_LEN = 10
GOPHER_ALPHA_FRAC = (4, 5)  # >= 80% of words contain an alphabetic char
GOPHER_SYMBOL_FRAC = (1, 10)  # '#'/'...' per word <= 0.1
GOPHER_REQ_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
# Gopher's canonical threshold is 2; the synthetic corpus vocabulary
# carries exactly one word from the required list ("the"), so 2 would
# fail every document and the gate would verify nothing.  1 keeps the
# rule structure and splits the corpus ~382/118 at sf0.01.
GOPHER_MIN_REQ_STOP = 1     # distinct required stopwords present

# C4 §2.2 bounds
C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3
C4_SENT_TOKENS = 8          # synthesized-line length for the driver query

_TOK = SQL_TOKENS.format(expr="text")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scan-side scalar batteries: spread the single local file so all
    # cores participate (a cluster scan already has splits)
    return spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


def _round4(col: Column) -> Column:
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


# ---------------------------------------------------------------------------
# Gopher quality rules
# ---------------------------------------------------------------------------

def gopher_flags(toks) -> dict:
    """Gopher §A1.1 metrics + rule flags as codegen Columns over a
    staged token-array column — THE battery definition, shared by
    ``gopher_rules_frame`` and the classifier audits (webcalib.py /
    webpr.py fuse ``keep`` into their scan projections), so an edit
    to the battery can never leave an inline copy stale (round-4
    advisor note).  Bound checks are exact integer cross-products,
    never float divisions."""
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

    r_words = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    r_len = (sum_len >= GOPHER_MIN_AVG_LEN * n_words) & (
        sum_len <= GOPHER_MAX_AVG_LEN * n_words
    )
    a_num, a_den = GOPHER_ALPHA_FRAC
    r_alpha = a_den * n_alpha >= a_num * n_words
    s_num, s_den = GOPHER_SYMBOL_FRAC
    r_sym = s_den * n_sym <= s_num * n_words
    r_stop = n_stop >= GOPHER_MIN_REQ_STOP
    return {
        "n_words": n_words,
        "sum_len": sum_len,
        "n_alpha": n_alpha,
        "n_sym": n_sym,
        "n_stop": n_stop,
        "r_word_count": r_words,
        "r_word_len": r_len,
        "r_alpha": r_alpha,
        "r_symbol": r_sym,
        "r_stopwords": r_stop,
        "keep": r_words & r_len & r_alpha & r_sym & r_stop,
    }


def gopher_rules_frame(docs: DataFrame) -> DataFrame:
    """Append the Gopher §A1.1 rule flags to a frame carrying ``text``.

    One projection, no exchange: every rule folds the staged token
    array with codegen'd lambdas (``gopher_flags``).
    """
    staged = docs.select(
        "doc_id", "text", tokens(F.col("text")).alias("toks")
    )
    g = gopher_flags(F.col("toks"))
    n_words, sum_len, n_alpha = g["n_words"], g["sum_len"], g["n_alpha"]

    # empty documents: every reported ratio divides by n_words, and a
    # 0/0 is NULL in Spark but engine-dependent elsewhere — pin both
    # ratios to 0.0 so the row stays well-defined (the integer
    # cross-product rules never divide, so they need no guard)
    safe4 = lambda c: F.when(n_words > 0, _round4(c)).otherwise(  # noqa: E731
        F.lit(0.0)
    )
    return staged.select(
        "doc_id",
        n_words.alias("n_words"),
        safe4(sum_len / n_words).alias("mean_word_len"),
        safe4(n_alpha / n_words).alias("alpha_word_ratio"),
        g["n_stop"].alias("n_req_stopwords"),
        g["r_word_count"].alias("r_word_count"),
        g["r_word_len"].alias("r_word_len"),
        g["r_alpha"].alias("r_alpha"),
        g["r_symbol"].alias("r_symbol"),
        g["r_stopwords"].alias("r_stopwords"),
        g["keep"].alias("keep"),
    )


def gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_rules_frame(_docs(spark, sf_dir))


_STOP_IN = ", ".join(f"'{w}'" for w in GOPHER_REQ_STOPWORDS)

GOPHER_RULES_SQL = f"""
WITH t AS (
  SELECT doc_id, {_TOK} AS tok FROM documents
),
m AS (
  SELECT doc_id,
         len(tok)::BIGINT AS n_words,
         coalesce(list_sum(list_transform(tok, x -> length(x))),
                  0)::BIGINT AS sum_len,
         len(list_filter(tok, x -> regexp_matches(x, '[a-z]')))::BIGINT AS n_alpha,
         len(list_filter(tok, x -> starts_with(x, '#')
                                   OR contains(x, '...')))::BIGINT AS n_sym,
         (SELECT count(DISTINCT w) FROM unnest(tok) AS u(w)
          WHERE w IN ({_STOP_IN}))::BIGINT AS n_stop
  FROM t
)
SELECT doc_id,
       n_words,
       CASE WHEN n_words = 0 THEN 0.0
            ELSE floor(sum_len / n_words * 10000 + 0.5) / 10000
       END AS mean_word_len,
       CASE WHEN n_words = 0 THEN 0.0
            ELSE floor(n_alpha / n_words * 10000 + 0.5) / 10000
       END AS alpha_word_ratio,
       n_stop AS n_req_stopwords,
       (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})
         AS r_word_count,
       (sum_len >= {GOPHER_MIN_AVG_LEN} * n_words
        AND sum_len <= {GOPHER_MAX_AVG_LEN} * n_words) AS r_word_len,
       ({GOPHER_ALPHA_FRAC[1]} * n_alpha >= {GOPHER_ALPHA_FRAC[0]} * n_words)
         AS r_alpha,
       ({GOPHER_SYMBOL_FRAC[1]} * n_sym <= {GOPHER_SYMBOL_FRAC[0]} * n_words)
         AS r_symbol,
       (n_stop >= {GOPHER_MIN_REQ_STOP}) AS r_stopwords,
       ((n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})
        AND (sum_len >= {GOPHER_MIN_AVG_LEN} * n_words
             AND sum_len <= {GOPHER_MAX_AVG_LEN} * n_words)
        AND ({GOPHER_ALPHA_FRAC[1]} * n_alpha
             >= {GOPHER_ALPHA_FRAC[0]} * n_words)
        AND ({GOPHER_SYMBOL_FRAC[1]} * n_sym
             <= {GOPHER_SYMBOL_FRAC[0]} * n_words)
        AND (n_stop >= {GOPHER_MIN_REQ_STOP})) AS keep
FROM m
"""


# ---------------------------------------------------------------------------
# C4 line filters
# ---------------------------------------------------------------------------

def c4_filter_frame(docs: DataFrame) -> DataFrame:
    """C4 §2.2 line filters over a frame whose ``text`` carries
    newline-separated lines.

    Array lambdas over ``split(text, '\\n')`` keep the whole filter in
    the scan task — the alternative explode-filter-regroup shape pays
    two corpus-sized exchanges for the same answer.
    """
    staged = docs.select(
        "doc_id", "text", F.split("text", "\n").alias("lines")
    )
    kept = F.filter(
        F.col("lines"),
        lambda l: l.rlike('[.!?"]$')
        & (F.size(tokens(l)) >= C4_MIN_LINE_WORDS),
    )
    lower = F.lower(F.col("text"))
    has_lorem = lower.contains("lorem ipsum")
    has_brace = lower.contains("{")
    return staged.select(
        "doc_id",
        F.size("lines").alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        F.array_join(kept, "\n").alias("clean_text"),
        (
            (F.size(kept) >= C4_MIN_KEPT_LINES) & ~has_lorem & ~has_brace
        ).alias("keep"),
    )


def _with_synth_lines(docs: DataFrame) -> DataFrame:
    """Deterministic line structure for the punctuation-free driver
    corpus: consecutive 8-token sentences, '.'-terminated unless the
    per-sentence 60-bit hash rolls 0 mod 4 (75% terminated)."""
    staged = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    toks = F.col("toks")
    n_sent = F.expr(f"(size(toks) + {C4_SENT_TOKENS - 1}) div {C4_SENT_TOKENS}")
    line = lambda i: F.concat(  # noqa: E731
        F.array_join(
            F.slice(toks, (i - 1) * C4_SENT_TOKENS + 1, C4_SENT_TOKENS), " "
        ),
        F.when(
            portable_hash60(
                F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                         i.cast("string"))
            ) % 4 == 0,
            F.lit(""),
        ).otherwise(F.lit(".")),
    )
    # sequence(1, 0) DESCENDS to [1, 0] in Spark, so an empty document
    # would fabricate two bogus lines while the dual's range(1, 1) is
    # empty; start at 0 and drop it to get a guaranteed-ascending,
    # empty-safe index array (n_sent >= 0 always).
    idx = F.filter(F.sequence(F.lit(0), n_sent), lambda i: i >= 1)
    return staged.select(
        "doc_id",
        F.array_join(F.transform(idx, line), "\n").alias("text"),
    )


def c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return c4_filter_frame(_with_synth_lines(_docs(spark, sf_dir)))


_SENT_HASH = sql_hash60("doc_id || ':' || i")
_SYNTH_LINE = (
    f"array_to_string(tok[((i-1)*{C4_SENT_TOKENS}+1):(i*{C4_SENT_TOKENS})], ' ')"
    f" || (case when {_SENT_HASH} % 4 = 0"
    f" then '' else '.' end)"
)
_LINE_TOK = SQL_TOKENS.format(expr="l")

C4_FILTERS_SQL = f"""
WITH t AS (
  SELECT doc_id, {_TOK} AS tok FROM documents
),
s AS (
  SELECT doc_id,
         list_transform(range(1, (len(tok) + {C4_SENT_TOKENS - 1})
                                 // {C4_SENT_TOKENS} + 1),
                        i -> {_SYNTH_LINE}) AS lines
  FROM t
),
x AS (
  SELECT doc_id, lines,
         list_filter(lines,
                     l -> regexp_matches(l, '[.!?"]$')
                          AND len({_LINE_TOK}) >= {C4_MIN_LINE_WORDS}) AS kept,
         lower(array_to_string(lines, chr(10))) AS full_text
  FROM s
)
SELECT doc_id,
       len(lines) AS n_lines,
       len(kept) AS n_kept_lines,
       coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
       (len(kept) >= {C4_MIN_KEPT_LINES}
        AND NOT contains(full_text, 'lorem ipsum')
        AND NOT contains(full_text, '{{')) AS keep
FROM x
"""


# ---------------------------------------------------------------------------
# Hashed linear quality classifier (fastText-style inference)
# ---------------------------------------------------------------------------

QCLF_BUCKETS = 512
QCLF_THRESH_MICRO = 0  # keep iff mean token weight >= 0


def _qclf_weights() -> list[int]:
    """Deterministic classifier weights in micro-units, one per hash
    bucket, seeded from md5 so both engines inline the SAME literal
    table (the DSIR/PQ technique).  Range [-1.0, 1.0]."""
    import hashlib

    out = []
    for b in range(QCLF_BUCKETS):
        h = int(hashlib.md5(f"qclf-w-{b}".encode()).hexdigest()[:15], 16)
        out.append(h % 2_000_001 - 1_000_000)
    return out


QCLF_WEIGHTS = _qclf_weights()


def quality_classifier_frame(docs: DataFrame) -> DataFrame:
    """fastText-style linear quality classifier (Joulin et al. 2016;
    the GPT-3/LLaMA curation stage: Brown et al. 2020 Appendix A's
    "quality classifier" over hashed word features).

    Inference is ONE codegen projection in the scan task — zero joins,
    zero exchanges, no Python: each token hashes to one of
    ``QCLF_BUCKETS`` feature buckets (the hashing trick), the weight
    table rides the plan as a single array literal staged as a bound
    attribute, and the document logit is the mean bucket weight.  At
    10^12 documents this is embarrassingly parallel; a real trained
    model drops in by replacing the literal table (a 512-int broadcast
    is free at any scale).  The keep decision compares exact bigint
    micro-units cross-multiplied by the token count — bit-identical
    across engines, no float threshold."""
    staged = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).withColumn("w", F.lit(QCLF_WEIGHTS))
    sum_w = F.aggregate(
        F.col("toks"),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc
        + F.element_at(
            F.col("w"), (portable_hash60(t) % QCLF_BUCKETS).cast("int") + 1
        ),
    )
    n_toks = F.size("toks").cast("bigint")
    return staged.select(
        "doc_id",
        n_toks.alias("n_toks"),
        F.when(n_toks == 0, F.lit(0.0))
        .otherwise(_round4(sum_w / 1000000.0 / n_toks))
        .alias("logit"),
        (sum_w >= QCLF_THRESH_MICRO * n_toks).alias("keep"),
    )


def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_classifier_frame(_docs(spark, sf_dir))


_W_LIST = "[" + ", ".join(str(w) for w in QCLF_WEIGHTS) + "]"
_BUCKET = f"((('0x' || substr(md5(x), 1, 15))::BIGINT) % {QCLF_BUCKETS})::INT"

QUALITY_CLASSIFIER_SQL = f"""
WITH t AS (
  SELECT doc_id, {_TOK} AS tok FROM documents
),
m AS (
  SELECT doc_id,
         len(tok)::BIGINT AS n_toks,
         coalesce(list_sum(list_transform(tok,
                     x -> ({_W_LIST})[{_BUCKET} + 1])), 0)::BIGINT AS sum_w
  FROM t
)
SELECT doc_id,
       n_toks,
       CASE WHEN n_toks = 0 THEN 0.0
            ELSE floor(sum_w / 1000000.0 / n_toks * 10000 + 0.5) / 10000
       END AS logit,
       (sum_w >= {QCLF_THRESH_MICRO} * n_toks) AS keep
FROM m
"""


QUERIES: dict[str, tuple] = {
    "corpus_gopher_rules": (gopher_rules, GOPHER_RULES_SQL),
    "corpus_c4_filters": (c4_filters, C4_FILTERS_SQL),
    "text_quality_classifier": (quality_classifier, QUALITY_CLASSIFIER_SQL),
}
