"""RedPajama-v2-style quality-signal battery (SURVEY.md §2.11).

The RPv2 release (Together AI 2023, "RedPajama: an Open Dataset for
Training Large Language Models"; the `quality_signals` companion files)
ships ~40 per-document signals that downstream pipelines threshold
however they like — the battery is computed ONCE over the crawl and the
filter policy becomes a cheap predicate over the signal table.  This
module reproduces the natural-language core of that battery — the
token-level and line-level signals that need no external model — with
one operator emitting all of them per document:

* token signals: word count, mean word length, all-caps-word fraction,
  no-alphabetic-word fraction, unique-word fraction, stop-word
  fraction, symbol-to-word ratio, unigram entropy;
* line signals: sentence count, terminal-punctuation /
  ellipsis-terminated / bullet-started / all-caps line fractions.

Scale shape: NO per-document frequency maps and no quadratic scan-side
entropy — one explode over the decorated tokens feeds two map-side-
combinable aggregations ((doc_id, token) → doc_id), so the only
corpus-sized exchange carries (doc_id, token, partial count) short
rows, and line-level counters are computed scan-side BEFORE the
explode and ride the first aggregation as `min()` (constant per doc;
`first()` would silently degrade HashAggregate → SortAggregate).  The
entropy uses the log identity H = ln n − (Σ c·ln c)/n so both passes
fold into ONE aggregation — `Σ c·ln c` accumulates per-token during
the same groupBy that produces the counts.  At 10^12 documents this is
the same plan as a word-count: embarrassingly parallel scan, one
shuffle of short rows, partial aggregation everywhere.

Exactness: entropy terms are exact bigint micro-nats
(`floor(ln(x)·1e6 + 0.5)` — the validated cross-engine pattern from
the unigram LM), so `entropy_micro_x_n = n·lnμ(n) − Σ c·lnμ(c)` is a
bit-exact bigint in both engines; the human-readable `unigram_entropy`
is the standard engine-identical half-up 4dp rounding of its double
view.  All fractions are `floor(x·1e4+0.5)/1e4` with zero-denominator
guards.

The driver corpus is punctuation-free lowercase prose, so the battery
decorates it in-engine first (the `corpus_c4_filters` /
`web_meta_extract` technique): deterministic 8-token sentences where a
per-sentence 60-bit hash rolls ALL-CAPS casing (1/7), a `"- "` bullet
prefix (1/5), and an `"..."` / bare / `"."` line ending (1/6, 1/4
of the rest, else) — both engines derive byte-identical decorated
lines from `documents.text`, so every signal splits the corpus instead
of verifying a column of zeros.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60
from .webquality import GOPHER_REQ_STOPWORDS

RPV2_SENT_TOKENS = 8
CAPS_MOD = 7      # 1/7 of sentences are fully uppercased
BULLET_MOD = 5    # 1/5 start with "- "
ELLIPSIS_MOD = 6  # 1/6 end with "..."
BARE_MOD = 4      # 1/4 of the remainder end unterminated (C4 roll)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


def _round4(col: Column) -> Column:
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


def _ln_micro(col: Column) -> Column:
    """Exact micro-nat ln — floor(ln(x)*1e6 + 0.5) as bigint, the
    cross-engine-validated rounding from the unigram LM."""
    return F.floor(F.log(col.cast("double")) * 1000000 + F.lit(0.5)).cast(
        "bigint"
    )


def _roll(salt: str, i) -> Column:
    return portable_hash60(
        F.concat(
            F.lit(salt + ":"), F.col("doc_id").cast("string"), F.lit(":"),
            i.cast("string"),
        )
    )


def _decorated_lines(docs: DataFrame) -> DataFrame:
    """Deterministic decorated sentence array for the plain driver
    corpus: per sentence, hash-rolled ALL-CAPS casing, bullet prefix,
    and ellipsis/bare/terminal ending (byte-identical in the dual)."""
    from ..functions.text import tokens

    staged = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    toks = F.col("toks")
    n_sent = F.expr(
        f"(size(toks) + {RPV2_SENT_TOKENS - 1}) div {RPV2_SENT_TOKENS}"
    )

    def line(i):
        base = F.array_join(
            F.slice(toks, (i - 1) * RPV2_SENT_TOKENS + 1, RPV2_SENT_TOKENS),
            " ",
        )
        cased = F.when(_roll("u", i) % CAPS_MOD == 0, F.upper(base)).otherwise(
            base
        )
        bullet = F.when(_roll("b", i) % BULLET_MOD == 0, F.lit("- ")).otherwise(
            F.lit("")
        )
        ending = (
            F.when(_roll("e", i) % ELLIPSIS_MOD == 0, F.lit("..."))
            .when(_roll("t", i) % BARE_MOD == 0, F.lit(""))
            .otherwise(F.lit("."))
        )
        return F.concat(bullet, cased, ending)

    # sequence(1, 0) DESCENDS in Spark; start at 0 and drop it so an
    # empty document yields an empty line array like the dual.
    idx = F.filter(F.sequence(F.lit(0), n_sent), lambda i: i >= 1)
    return staged.select(
        "doc_id", F.transform(idx, line).alias("lines")
    )


def rpv2_signals_frame(docs: DataFrame) -> DataFrame:
    lined = _decorated_lines(docs)
    lines = F.col("lines")
    is_caps_line = lambda l: (l == F.upper(l)) & l.rlike("[A-Za-z]")  # noqa: E731
    staged = lined.select(
        "doc_id",
        F.size(lines).cast("bigint").alias("num_sentences"),
        F.size(F.filter(lines, lambda l: l.rlike('[.!?"]$')))
        .cast("bigint").alias("n_term"),
        F.size(F.filter(lines, lambda l: l.endswith("...")))
        .cast("bigint").alias("n_ell"),
        F.size(F.filter(lines, lambda l: l.startswith("- ")))
        .cast("bigint").alias("n_bullet"),
        F.size(F.filter(lines, is_caps_line)).cast("bigint").alias("n_caps"),
        # case-preserving tokens — the battery's caps signals need the
        # decorated casing, so NOT the shared lowercasing tokenizer
        F.filter(
            F.split(F.array_join(lines, "\n"), r"\s+"), lambda t: t != ""
        ).alias("toks"),
    )
    ex = staged.select(
        "doc_id", "num_sentences", "n_term", "n_ell", "n_bullet", "n_caps",
        F.explode("toks").alias("tok"),
    )
    # pass 1: (doc_id, token) counts; the line counters are constant per
    # doc so min() carries them without breaking HashAggregate
    g1 = ex.groupBy("doc_id", "tok").agg(
        F.count("*").cast("bigint").alias("c"),
        *[
            F.min(k).alias(k)
            for k in ("num_sentences", "n_term", "n_ell", "n_bullet", "n_caps")
        ],
    )
    tok = F.col("tok")
    clean = F.lower(F.regexp_replace(tok, "[^A-Za-z]", ""))
    is_caps = tok.rlike("[A-Z]") & ~tok.rlike("[a-z]")
    no_alph = ~tok.rlike("[A-Za-z]")
    is_stop = clean.isin(*GOPHER_REQ_STOPWORDS)
    is_sym = tok.startswith("#") | tok.contains("...")
    c = F.col("c")
    # pass 2: doc_id rollup; Σ c·lnμ(c) rides the same agg (entropy via
    # H = ln n − (Σ c·ln c)/n, so no second pass over the tokens)
    g2 = g1.groupBy(
        "doc_id", "num_sentences", "n_term", "n_ell", "n_bullet", "n_caps"
    ).agg(
        F.sum(c).alias("word_count"),
        F.count("*").cast("bigint").alias("n_unique"),
        F.sum(c * F.length(tok)).alias("sum_len"),
        F.sum(F.when(is_caps, c).otherwise(F.lit(0))).alias("n_caps_w"),
        F.sum(F.when(no_alph, c).otherwise(F.lit(0))).alias("n_noalph"),
        F.sum(F.when(is_stop, c).otherwise(F.lit(0))).alias("n_stop"),
        F.sum(F.when(is_sym, c).otherwise(F.lit(0))).alias("n_sym"),
        F.sum(c * _ln_micro(c)).alias("sum_clnc"),
    )
    n = F.col("word_count")
    ns = F.col("num_sentences")
    safe = lambda num, den: F.when(  # noqa: E731
        den > 0, _round4(num / den)
    ).otherwise(F.lit(0.0))
    ent_num = n * _ln_micro(n) - F.col("sum_clnc")
    return g2.select(
        "doc_id",
        n.alias("word_count"),
        safe(F.col("sum_len"), n).alias("mean_word_length"),
        safe(F.col("n_caps_w"), n).alias("frac_all_caps_words"),
        safe(F.col("n_noalph"), n).alias("frac_no_alph_words"),
        safe(F.col("n_unique"), n).alias("frac_unique_words"),
        safe(F.col("n_stop"), n).alias("stop_word_fraction"),
        safe(F.col("n_sym"), n).alias("symbol_word_ratio"),
        ent_num.alias("entropy_micro_x_n"),
        F.when(n > 0, _round4(ent_num / n / F.lit(1000000.0)))
        .otherwise(F.lit(0.0)).alias("unigram_entropy"),
        ns.alias("num_sentences"),
        safe(F.col("n_term"), ns).alias("frac_lines_terminal_punct"),
        safe(F.col("n_ell"), ns).alias("frac_lines_end_ellipsis"),
        safe(F.col("n_bullet"), ns).alias("frac_lines_start_bullet"),
        safe(F.col("n_caps"), ns).alias("frac_lines_all_caps"),
    )


def rpv2_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rpv2_signals_frame(_docs(spark, sf_dir))


_TOK_LOWER = (
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0)"
)
_STOP_IN = ", ".join(f"'{w}'" for w in GOPHER_REQ_STOPWORDS)


def _sql_roll(salt: str) -> str:
    return sql_hash60(f"'{salt}:' || doc_id || ':' || i")


_SYNTH_LINE = (
    f"(case when {_sql_roll('b')} % {BULLET_MOD} = 0 then '- ' else '' end)"
    f" || (case when {_sql_roll('u')} % {CAPS_MOD} = 0"
    f" then upper(array_to_string("
    f"tok[((i-1)*{RPV2_SENT_TOKENS}+1):(i*{RPV2_SENT_TOKENS})], ' '))"
    f" else array_to_string("
    f"tok[((i-1)*{RPV2_SENT_TOKENS}+1):(i*{RPV2_SENT_TOKENS})], ' ') end)"
    f" || (case when {_sql_roll('e')} % {ELLIPSIS_MOD} = 0 then '...'"
    f" when {_sql_roll('t')} % {BARE_MOD} = 0 then ''"
    f" else '.' end)"
)

RPV2_SIGNALS_SQL = f"""
WITH t AS (
  SELECT doc_id, {_TOK_LOWER} AS tok FROM documents
),
s AS (
  SELECT doc_id,
         list_transform(range(1, (len(tok) + {RPV2_SENT_TOKENS - 1})
                                 // {RPV2_SENT_TOKENS} + 1),
                        i -> {_SYNTH_LINE}) AS lines
  FROM t
),
ln_stats AS (
  SELECT doc_id,
         len(lines)::BIGINT AS num_sentences,
         len(list_filter(lines, l -> regexp_matches(l, '[.!?"]$')))::BIGINT
           AS n_term,
         len(list_filter(lines, l -> l LIKE '%...'))::BIGINT AS n_ell,
         len(list_filter(lines, l -> l LIKE '- %'))::BIGINT AS n_bullet,
         len(list_filter(lines, l -> l = upper(l)
                                      AND regexp_matches(l, '[A-Za-z]')))
           ::BIGINT AS n_caps,
         list_filter(string_split_regex(array_to_string(lines, chr(10)),
                                        '\\s+'),
                     x -> length(x) > 0) AS dtok
  FROM s
),
ex AS (
  SELECT doc_id, num_sentences, n_term, n_ell, n_bullet, n_caps,
         unnest(dtok) AS tok
  FROM ln_stats
),
g1 AS (
  SELECT doc_id, tok, count(*)::BIGINT AS c,
         min(num_sentences) AS num_sentences, min(n_term) AS n_term,
         min(n_ell) AS n_ell, min(n_bullet) AS n_bullet,
         min(n_caps) AS n_caps
  FROM ex GROUP BY doc_id, tok
),
g2 AS (
  SELECT doc_id, num_sentences, n_term, n_ell, n_bullet, n_caps,
         sum(c)::BIGINT AS word_count,
         count(*)::BIGINT AS n_unique,
         sum(c * length(tok))::BIGINT AS sum_len,
         sum(CASE WHEN regexp_matches(tok, '[A-Z]')
                       AND NOT regexp_matches(tok, '[a-z]')
                  THEN c ELSE 0 END)::BIGINT AS n_caps_w,
         sum(CASE WHEN NOT regexp_matches(tok, '[A-Za-z]')
                  THEN c ELSE 0 END)::BIGINT AS n_noalph,
         sum(CASE WHEN lower(regexp_replace(tok, '[^A-Za-z]', '', 'g'))
                       IN ({_STOP_IN})
                  THEN c ELSE 0 END)::BIGINT AS n_stop,
         sum(CASE WHEN starts_with(tok, '#') OR contains(tok, '...')
                  THEN c ELSE 0 END)::BIGINT AS n_sym,
         sum(c * floor(ln(c::DOUBLE) * 1000000 + 0.5)::BIGINT)::BIGINT
           AS sum_clnc
  FROM g1
  GROUP BY doc_id, num_sentences, n_term, n_ell, n_bullet, n_caps
)
SELECT doc_id,
       word_count,
       CASE WHEN word_count > 0
            THEN floor(sum_len / word_count * 10000 + 0.5) / 10000
            ELSE 0.0 END AS mean_word_length,
       CASE WHEN word_count > 0
            THEN floor(n_caps_w / word_count * 10000 + 0.5) / 10000
            ELSE 0.0 END AS frac_all_caps_words,
       CASE WHEN word_count > 0
            THEN floor(n_noalph / word_count * 10000 + 0.5) / 10000
            ELSE 0.0 END AS frac_no_alph_words,
       CASE WHEN word_count > 0
            THEN floor(n_unique / word_count * 10000 + 0.5) / 10000
            ELSE 0.0 END AS frac_unique_words,
       CASE WHEN word_count > 0
            THEN floor(n_stop / word_count * 10000 + 0.5) / 10000
            ELSE 0.0 END AS stop_word_fraction,
       CASE WHEN word_count > 0
            THEN floor(n_sym / word_count * 10000 + 0.5) / 10000
            ELSE 0.0 END AS symbol_word_ratio,
       (word_count * floor(ln(word_count::DOUBLE) * 1000000 + 0.5)::BIGINT
        - sum_clnc)::BIGINT AS entropy_micro_x_n,
       CASE WHEN word_count > 0
            THEN floor((word_count
                        * floor(ln(word_count::DOUBLE) * 1000000 + 0.5)::BIGINT
                        - sum_clnc)
                       / word_count / 1000000.0 * 10000 + 0.5) / 10000
            ELSE 0.0 END AS unigram_entropy,
       num_sentences,
       CASE WHEN num_sentences > 0
            THEN floor(n_term / num_sentences * 10000 + 0.5) / 10000
            ELSE 0.0 END AS frac_lines_terminal_punct,
       CASE WHEN num_sentences > 0
            THEN floor(n_ell / num_sentences * 10000 + 0.5) / 10000
            ELSE 0.0 END AS frac_lines_end_ellipsis,
       CASE WHEN num_sentences > 0
            THEN floor(n_bullet / num_sentences * 10000 + 0.5) / 10000
            ELSE 0.0 END AS frac_lines_start_bullet,
       CASE WHEN num_sentences > 0
            THEN floor(n_caps / num_sentences * 10000 + 0.5) / 10000
            ELSE 0.0 END AS frac_lines_all_caps
FROM g2
"""


QUERIES: dict[str, tuple] = {
    "text_rpv2_signals": (rpv2_signals, RPV2_SIGNALS_SQL),
}
