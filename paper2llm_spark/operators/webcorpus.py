"""Web-corpus curation operators, part 2 (SURVEY.md §2.11).

Four more operators a 100 TB training-data pipeline runs between crawl
and tokenizer, each with the plan shape that survives the scale-up:

* **Duplicated-block removal** (Lee et al. 2022 "Deduplicating Training
  Data Makes Language Models Better", exact-substring dedup; the CCNet
  / RefinedWeb duplicated-line filter is the same operator with a line
  segmenter).  Documents are segmented into consecutive W-token
  windows; a window whose 60-bit hash occurs >= 2 times corpus-wide is
  removed from EVERY copy.  Plan: one explode, one map-side-combinable
  count to build the duplicated-hash set — which is small relative to
  the corpus (it is the duplicated tail only), so the membership probe
  is a **broadcast** hash join — then ONE reassembly shuffle on doc_id
  (the same groupBy-sort shape the flagship page reassembly uses).
* **Domain statistics**: per-source corpus profile (docs, tokens,
  language mix).  ONE aggregation with its map-side partial phase; the
  shuffle carries a handful of counters per (source, partition).
* **Per-domain document cap** (RefinedWeb §3.1 keeps at most K pages
  per registered domain so link-farms cannot dominate the corpus):
  top-K by quality inside each source via row_number — ONE exchange on
  source; the quality expression is the shared codegen-only scorer
  from operators/textstats.py (zero extra scans).
* **Unigram LM quality proxy** (the KenLM-perplexity filter of CCNet /
  GPT-3 data work, reduced to a unigram model so the DuckDB dual is
  exact): pass 1 builds the top-V vocabulary with corpus log-probs —
  a vocab-sized frame that is explicitly **broadcast**, never collected
  row-per-token; pass 2 scores each document as the mean token
  log-prob with an ln(1/total) floor for out-of-vocabulary tokens.
  Log-probs travel as exact bigint micro-nats so the per-doc mean is
  independent of Spark's partial-sum order (same trick as
  webstats.sessionize).

Every query has a DuckDB dual with identical column names; doubles use
the engine-identical floor(x*1e4+0.5)/1e4 half-up rounding and hashes
the portable 60-bit md5 (functions/text.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, portable_hash60, sql_hash60, tokens
from .textstats import with_quality

WINDOW_W = 10          # tokens per dedup window
DOMAIN_CAP_K = 10      # max docs kept per source
VOCAB_V = 16           # unigram-LM vocabulary size (corpus has 31)

_TOK = SQL_TOKENS.format(expr="text")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-file local scan -> spread; a cluster scan already has splits
    return spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


def _round4(col: Column) -> Column:
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


# ---------------------------------------------------------------------------
# duplicated-block (token-window) removal
# ---------------------------------------------------------------------------

def window_dedup_frame(docs: DataFrame) -> DataFrame:
    """Remove every W-token window whose hash repeats corpus-wide.

    The duplicated-hash set is built with one partial-agg count and
    broadcast (it is the duplicated tail of the window distribution,
    orders of magnitude smaller than the corpus); the only corpus-sized
    shuffle is the per-doc reassembly groupBy.  Zero-token documents
    cannot occur in this corpus and are dropped by the inner explode.
    """
    toks_df = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    n_win = (F.floor((F.size("toks") - 1) / WINDOW_W) + 1).cast("int")
    windows = F.transform(
        F.sequence(F.lit(1), n_win),
        lambda i: F.struct(
            i.alias("win_idx"),
            F.array_join(
                F.slice(F.col("toks"), (i - F.lit(1)) * WINDOW_W + 1, WINDOW_W),
                " ",
            ).alias("win"),
        ),
    )
    ex = (
        toks_df.select("doc_id", F.explode(windows).alias("w"))
        .select(
            "doc_id",
            F.col("w.win_idx").alias("win_idx"),
            F.col("w.win").alias("win"),
            portable_hash60(F.col("w.win")).alias("wh"),
        )
    )
    hot = (
        ex.groupBy("wh")
        .count()
        .filter(F.col("count") >= 2)
        .select("wh", F.lit(1).alias("dup"))
    )
    marked = ex.join(F.broadcast(hot), "wh", "left")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_windows"),
            F.count("dup").cast("bigint").alias("n_dup_windows"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("dup").isNull(),
                                F.struct("win_idx", "win"),
                            )
                        )
                    ),
                    lambda s: s["win"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )


def window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return window_dedup_frame(_docs(spark, sf_dir))


_WIN_SLICE = f"list_reduce(tok[(i-1)*{WINDOW_W}+1 : i*{WINDOW_W}], (a,b) -> a || ' ' || b)"

WINDOW_DEDUP_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOK} AS tok FROM documents),
w AS (
  SELECT doc_id, win_idx, win, {sql_hash60("win")} AS wh
  FROM (
    SELECT doc_id,
           unnest(range(1, 2 + (len(tok) - 1) // {WINDOW_W})) AS win_idx,
           unnest(list_transform(range(1, 2 + (len(tok) - 1) // {WINDOW_W}),
                                 i -> {_WIN_SLICE})) AS win
    FROM toks WHERE len(tok) > 0
  )
),
hot AS (SELECT wh FROM w GROUP BY wh HAVING count(*) >= 2)
SELECT doc_id,
       count(*)::BIGINT AS n_windows,
       count(*) FILTER (WHERE hot.wh IS NOT NULL)::BIGINT AS n_dup_windows,
       coalesce(
         string_agg(win, ' ' ORDER BY win_idx)
           FILTER (WHERE hot.wh IS NULL),
         '') AS clean_text
FROM w LEFT JOIN hot ON w.wh = hot.wh
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# per-source domain statistics
# ---------------------------------------------------------------------------

def domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile per source: ONE hash aggregation, partial phase
    kept (plan-asserted); the shuffle carries counters, never text."""
    docs = _docs(spark, sf_dir).select(
        "source", "lang", F.size(tokens(F.col("text"))).alias("n_toks")
    )
    agg = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("n_tokens"),
        F.count_distinct("lang").cast("bigint").alias("n_langs"),
        F.count(F.when(F.col("lang") == "en", 1)).cast("bigint").alias("n_en"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_tokens",
        _round4(F.col("n_tokens") / F.col("n_docs")).alias("avg_doc_tokens"),
        "n_langs",
        _round4(F.col("n_en") / F.col("n_docs")).alias("en_frac"),
    )


DOMAIN_STATS_SQL = f"""
WITH d AS (SELECT source, lang, len({_TOK}) AS n_toks FROM documents),
a AS (
  SELECT source,
         count(*)::BIGINT AS n_docs,
         sum(n_toks)::BIGINT AS n_tokens,
         count(DISTINCT lang)::BIGINT AS n_langs,
         count(*) FILTER (WHERE lang = 'en')::BIGINT AS n_en
  FROM d GROUP BY source
)
SELECT source, n_docs, n_tokens,
       floor(n_tokens / n_docs * 10000 + 0.5) / 10000 AS avg_doc_tokens,
       n_langs,
       floor(n_en / n_docs * 10000 + 0.5) / 10000 AS en_frac
FROM a
"""


# ---------------------------------------------------------------------------
# per-domain document cap (RefinedWeb-style host cap)
# ---------------------------------------------------------------------------

def domain_cap_frame(docs_in: DataFrame) -> DataFrame:
    """Keep the K best documents per source by the shared quality
    score: ONE exchange on source (the row_number window); quality is
    scan-side codegen, no extra pass."""
    docs = docs_in.select(
        "doc_id", "source", "text", tokens(F.col("text")).alias("toks")
    )
    scored = with_quality(docs).select("doc_id", "source", "quality")
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= DOMAIN_CAP_K)
    )


def domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return domain_cap_frame(_docs(spark, sf_dir))


# quality formula mirrored from textstats.QUALITY_SQL (single source of
# truth for the weights is textstats.with_quality + this dual; a drift
# fails the driver gate for both queries)
_QUALITY_EXPR = """
floor((0.5 * round(CASE WHEN n_words > 0 THEN n_stop / n_words ELSE 0.0 END, 4)
    + 0.3 * (1.0 - round(CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END, 4))
    + 0.2 * least(n_words / 100.0, 1.0)) * 10000 + 0.5) / 10000
"""

_STOPWORDS_IN = "'the', 'a', 'of', 'and', 'is', 'in', 'to', 'it'"

DOMAIN_CAP_SQL = f"""
WITH t AS (
  SELECT doc_id, source,
         length(text) AS n_chars,
         len({_TOK}) AS n_words,
         len(list_filter({_TOK}, t -> t IN ({_STOPWORDS_IN}))) AS n_stop,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct
  FROM documents
),
q AS (SELECT doc_id, source, {_QUALITY_EXPR} AS quality FROM t),
r AS (
  SELECT doc_id, source, quality,
         row_number() OVER (PARTITION BY source
                            ORDER BY quality DESC, doc_id) AS rk
  FROM q
)
SELECT doc_id, source, quality, rk::BIGINT AS rk
FROM r WHERE rk <= {DOMAIN_CAP_K}
"""


# ---------------------------------------------------------------------------
# unigram LM quality proxy (KenLM-filter shape with an exact dual)
# ---------------------------------------------------------------------------

def unigram_micro_frame(
    docs: DataFrame, keys: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Per-document exact unigram-LM totals in bigint micro-nats
    against the corpus top-V vocabulary; OOV tokens score
    ln(1/total).  Shared engine for the LM score and the CCNet
    bucketing, so the two queries can never drift.

    Pass 1 (vocab) is a corpus token count whose shuffle carries only
    (token, partial_count) thanks to map-side combine, then a top-V
    truncation — the result is vocabulary-sized state and is BROADCAST
    to pass 2, never collected per-token.  Pass 2 aggregates exact
    bigint micro-nats per ``keys`` group, so every downstream mean /
    ordering is bit-stable across partial-sum orders and engines.
    """
    toks_df = docs.select(
        *keys, tokens(F.col("text")).alias("toks")
    )
    tok = toks_df.select(F.explode("toks").alias("tok"))
    counts = tok.groupBy("tok").agg(F.count("*").alias("cnt"))
    total_df = counts.agg(F.sum("cnt").alias("total"))
    vocab = (
        counts.orderBy(F.col("cnt").desc(), F.col("tok"))
        .limit(VOCAB_V)
        .crossJoin(F.broadcast(total_df))
        .select(
            "tok",
            F.floor(
                F.log(F.col("cnt") / F.col("total")) * 1000000 + F.lit(0.5)
            ).cast("bigint").alias("lp_micro"),
        )
    )
    ex = toks_df.select(*keys, F.explode("toks").alias("tok"))
    per_doc = (
        ex.join(F.broadcast(vocab), "tok", "left")
        .groupBy(*keys)
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.count(
                F.when(F.col("lp_micro").isNull(), 1)
            ).cast("bigint").alias("n_oov"),
            F.sum(F.coalesce("lp_micro", F.lit(0))).alias("sum_micro"),
        )
    )
    floor_micro = F.floor(
        F.log(F.lit(1.0) / F.col("total")) * 1000000 + F.lit(0.5)
    ).cast("bigint")
    return (
        per_doc.crossJoin(F.broadcast(total_df))
        .select(
            *keys,
            "n_tokens",
            "n_oov",
            (F.col("sum_micro") + F.col("n_oov") * floor_micro)
            .alias("total_micro"),
        )
    )


def unigram_logprob_frame(docs: DataFrame) -> DataFrame:
    """Mean unigram log-prob per document (rounded 4dp double view of
    the exact micro-nat totals)."""
    return unigram_micro_frame(docs).select(
        "doc_id",
        "n_tokens",
        "n_oov",
        _round4(
            F.col("total_micro") / F.lit(1000000.0) / F.col("n_tokens")
        ).alias("avg_logprob"),
    )


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    return unigram_logprob_frame(_docs(spark, sf_dir))


UNIGRAM_LOGPROB_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOK} AS tok FROM documents),
ex AS (SELECT doc_id, unnest(tok) AS tok FROM toks),
counts AS (SELECT tok, count(*) AS cnt FROM ex GROUP BY tok),
total AS (SELECT sum(cnt) AS total FROM counts),
vocab AS (
  SELECT tok,
         floor(ln(cnt / total.total) * 1000000 + 0.5)::BIGINT AS lp_micro
  FROM counts, total
  ORDER BY cnt DESC, tok LIMIT {VOCAB_V}
),
per_doc AS (
  SELECT e.doc_id,
         count(*)::BIGINT AS n_tokens,
         count(*) FILTER (WHERE v.lp_micro IS NULL)::BIGINT AS n_oov,
         coalesce(sum(v.lp_micro), 0) AS sum_micro
  FROM ex e LEFT JOIN vocab v USING (tok)
  GROUP BY e.doc_id
)
SELECT doc_id, n_tokens, n_oov,
       floor((sum_micro + n_oov * floor(ln(1.0 / total.total) * 1000000 + 0.5)::BIGINT)
             / 1000000.0 / n_tokens * 10000 + 0.5) / 10000 AS avg_logprob
FROM per_doc, total
"""


# ---------------------------------------------------------------------------
# CCNet head/middle/tail perplexity buckets
# ---------------------------------------------------------------------------

def ccnet_buckets_frame(docs: DataFrame) -> DataFrame:
    """CCNet §4.3 stratification: split each language's documents into
    head / middle / tail terciles by LM score (Wenzek et al. 2020 —
    the head bucket is what CCNet ships as training data; LLaMA-1
    consumed head+middle).

    Composed on :func:`unigram_micro_frame`, so the score can never
    drift from ``text_unigram_logprob``.  The tercile is one
    ``ntile(3)`` window per language — at 10^12 docs the only cost on
    top of the LM pass is ONE exchange of (doc_id, lang, 3 bigints)
    short rows on lang (|langs| partitions; a skewed mega-language
    splits fine because ntile is rank-based, computed after AQE
    re-splits the sort).  Ordering is exact: the key is
    ``floor(total_micro / n_tokens)`` — bigint micro-nats, identical
    in both engines — with doc_id as the tiebreak, so the bucket
    boundary is deterministic, never float-order dependent.
    """
    scored = unigram_micro_frame(docs, keys=("doc_id", "lang")).select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor(F.col("total_micro") / F.col("n_tokens"))
        .cast("bigint")
        .alias("avg_lp_micro"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("avg_lp_micro").desc(), F.col("doc_id")
    )
    nt = F.ntile(3).over(w)
    return scored.select(
        "doc_id",
        "lang",
        "n_tokens",
        "avg_lp_micro",
        F.when(nt == 1, "head")
        .when(nt == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


def ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ccnet_buckets_frame(_docs(spark, sf_dir))


CCNET_BUCKETS_SQL = f"""
WITH toks AS (SELECT doc_id, lang, {_TOK} AS tok FROM documents),
ex AS (SELECT doc_id, lang, unnest(tok) AS tok FROM toks),
counts AS (SELECT tok, count(*) AS cnt FROM ex GROUP BY tok),
total AS (SELECT sum(cnt) AS total FROM counts),
vocab AS (
  SELECT tok,
         floor(ln(cnt / total.total) * 1000000 + 0.5)::BIGINT AS lp_micro
  FROM counts, total
  ORDER BY cnt DESC, tok LIMIT {VOCAB_V}
),
per_doc AS (
  SELECT e.doc_id, e.lang,
         count(*)::BIGINT AS n_tokens,
         count(*) FILTER (WHERE v.lp_micro IS NULL)::BIGINT AS n_oov,
         coalesce(sum(v.lp_micro), 0) AS sum_micro
  FROM ex e LEFT JOIN vocab v USING (tok)
  GROUP BY e.doc_id, e.lang
),
scored AS (
  SELECT doc_id, lang, n_tokens,
         floor((sum_micro + n_oov *
                floor(ln(1.0 / total.total) * 1000000 + 0.5)::BIGINT)
               / n_tokens)::BIGINT AS avg_lp_micro
  FROM per_doc, total
),
b AS (
  SELECT *, ntile(3) OVER (PARTITION BY lang
                           ORDER BY avg_lp_micro DESC, doc_id) AS nt
  FROM scored
)
SELECT doc_id, lang, n_tokens, avg_lp_micro,
       CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
               ELSE 'tail' END AS bucket
FROM b
"""


# ---------------------------------------------------------------------------
# per-language document-length quantiles
# ---------------------------------------------------------------------------

LEN_QUANTILES = (0.1, 0.5, 0.9, 0.99)


def length_quantiles_frame(docs: DataFrame) -> DataFrame:
    """Per-language token-length distribution: doc count, min/max, and
    exact p10/p50/p90/p99 — the corpus profile every curation round
    reports before and after filtering (C4/Gopher/RefinedWeb all
    publish exactly this table).

    EXACT ``percentile`` is deliberately safe here at 100 TB: its
    aggregation state is a (length -> count) map bounded by the number
    of DISTINCT token lengths (~10^4 for real documents), not by row
    count, and it keeps its map-side partial phase — so the plan is one
    short-row exchange per language, same as a count.  For unbounded-
    cardinality metrics the swap is ``approx_percentile`` with the same
    call shape.  Spark's ``percentile`` and DuckDB's ``quantile_cont``
    both interpolate at rank (n−1)·p and agree bit-for-bit (verified —
    including the float tails), with ``_round4`` applied for the gate.
    """
    lens = docs.select(
        "lang", F.size(tokens(F.col("text"))).cast("bigint").alias("n_toks")
    )
    q = F.percentile("n_toks", F.lit(list(LEN_QUANTILES)))
    agg = lens.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.min("n_toks").alias("min_toks"),
        F.max("n_toks").alias("max_toks"),
        q.alias("q"),
    )
    sel = [
        "lang", "n_docs", "min_toks", "max_toks",
    ] + [
        _round4(F.element_at("q", i + 1)).alias(
            f"p{int(p * 100):02d}_toks"
        )
        for i, p in enumerate(LEN_QUANTILES)
    ]
    return agg.select(*sel).orderBy("lang")


def length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return length_quantiles_frame(_docs(spark, sf_dir))


_Q_LIST = "[" + ", ".join(str(p) for p in LEN_QUANTILES) + "]"
_Q_COLS = ",\n       ".join(
    f"floor(q[{i + 1}] * 10000 + 0.5) / 10000 AS p{int(p * 100):02d}_toks"
    for i, p in enumerate(LEN_QUANTILES)
)

LENGTH_QUANTILES_SQL = f"""
WITH l AS (
  SELECT lang, len({_TOK})::BIGINT AS n_toks FROM documents
),
a AS (
  SELECT lang, count(*)::BIGINT AS n_docs,
         min(n_toks) AS min_toks, max(n_toks) AS max_toks,
         quantile_cont(n_toks, {_Q_LIST}) AS q
  FROM l GROUP BY lang
)
SELECT lang, n_docs, min_toks, max_toks,
       {_Q_COLS}
FROM a ORDER BY lang
"""


# ---------------------------------------------------------------------------
# character-entropy quality signal
# ---------------------------------------------------------------------------

# Shannon entropy of the character distribution over a fixed alphabet —
# the classic gibberish/boilerplate detector (low entropy = repeated
# chars/padding, high ~ log2(26) = natural text). Letters + space + a
# few digits cover the corpus; unknown chars are simply not counted.
ENTROPY_ALPHABET = "abcdefghijklmnopqrstuvwxyz 0123456789"


def char_entropy_frame(docs: DataFrame) -> DataFrame:
    """Per-doc char entropy (nats): pure scan-side codegen — the char
    histogram is |alphabet| length/replace expressions, no explode, no
    shuffle (plan-asserted). Each -p*ln(p) term travels as an exact
    bigint micro-nat so the sum is order-independent; ln() agrees
    between the JVM and DuckDB to well inside the 6dp rounding."""
    lower = F.lower(F.col("text"))
    counts = [
        (F.length(lower) - F.length(F.replace(lower, F.lit(c)))).cast(
            "bigint"
        )
        for c in ENTROPY_ALPHABET
    ]
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    staged = docs.select(
        "doc_id",
        total.alias("n_alpha"),
        F.array(*counts).alias("hist"),
    )
    p = lambda n: n / F.col("n_alpha")
    term_micro = lambda n: F.when(
        n > 0, F.floor(-(p(n) * F.log(p(n))) * 1000000 + F.lit(0.5))
    ).otherwise(F.lit(0)).cast("bigint")
    micro = F.aggregate(
        F.transform(F.col("hist"), term_micro),
        F.lit(0).cast("bigint"),
        lambda a, v: a + v,
    )
    return staged.select(
        "doc_id",
        "n_alpha",
        F.when(
            F.col("n_alpha") > 0, _round4(micro / 1000000.0)
        ).otherwise(F.lit(0.0)).alias("char_entropy"),
    )


def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return char_entropy_frame(_docs(spark, sf_dir))


_ENT_COUNTS = ",\n    ".join(
    f"length(lw) - length(replace(lw, '{c}', ''))" for c in ENTROPY_ALPHABET
)

CHAR_ENTROPY_SQL = f"""
WITH l AS (SELECT doc_id, lower(text) AS lw FROM documents),
h AS (
  SELECT doc_id, [
    {_ENT_COUNTS}
  ] AS hist FROM l
),
s AS (SELECT doc_id, hist, list_sum(hist) AS n_alpha FROM h)
SELECT doc_id,
       n_alpha::BIGINT AS n_alpha,
       CASE WHEN n_alpha > 0 THEN
         floor(list_sum(list_transform(hist, n -> CASE WHEN n > 0
             THEN floor(-((n / n_alpha) * ln(n / n_alpha)) * 1000000 + 0.5)
             ELSE 0 END)) / 1000000.0 * 10000 + 0.5) / 10000
       ELSE 0.0 END AS char_entropy
FROM s
"""


QUERIES: dict[str, tuple] = {
    "corpus_window_dedup": (window_dedup, WINDOW_DEDUP_SQL),
    "corpus_domain_stats": (domain_stats, DOMAIN_STATS_SQL),
    "corpus_domain_cap": (domain_cap, DOMAIN_CAP_SQL),
    "text_unigram_logprob": (unigram_logprob, UNIGRAM_LOGPROB_SQL),
    "corpus_ccnet_buckets": (ccnet_buckets, CCNET_BUCKETS_SQL),
    "corpus_length_quantiles": (length_quantiles, LENGTH_QUANTILES_SQL),
    "text_char_entropy": (char_entropy, CHAR_ENTROPY_SQL),
}
