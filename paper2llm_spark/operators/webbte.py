"""BTE — Body Text Extraction (Finn, Kushmerick & Smyth, 2001), the
FOURTH published main-content extractor in the engine (jusText blocks
in ``webboiler.py``, CETR lines in ``webcetr.py``, Arc90 element
scoring in ``webarc90.py``).  BTE is token-based where the others are
block/line/element-based: the page is a binary sequence of tags and
words, and the body is the single contiguous token span that maximizes
(tags outside the span) + (words inside the span).

The objective is a maximum-subarray problem in disguise::

    T(i,j) = tags_before(i) + words_in(i,j) + tags_after(j)
           = total_tags + SUM_{n in [i,j]} (word_n - tag_n)

so maximizing T is Kadane's algorithm over the +-1 sequence
``s_n = +1 (word) / -1 (tag)`` — and Kadane distributes as two window
functions over exact integers:

1. prefix sums ``pre_j = SUM_{n<=j} s_n`` (running-sum window);
2. ``best_end(j) = pre_j - min_{i<j} pre_i`` (running-min window,
   with the EMPTY prefix ``pre_0 = 0`` always a candidate);
3. page argmax of ``best_end`` picks the span end; the span start is
   the argmin prefix carried INSIDE the running-min key.

Ties are broken deterministically toward the leftmost-longest span:
the running-min key is ``(pre + OFF) * KPOS + idx`` (min prefix value,
then SMALLEST index), and the page argmax key prefers the smallest end
index for equal scores.  All keys are exact bigints; score is shifted
nonnegative before encoding so neither engine's integer division ever
sees a negative numerator (Spark ``div`` truncates, DuckDB ``//``
floors — they only agree on nonnegative operands).

Plan shape (the scale story): page synthesis, tokenization
(``regexp_extract_all`` of ``<[^>]*>|[^\\s<]+``) and the sign column
are codegen in the scan task; the prefix-sum window, the running-min
window, the page argmax window AND the final per-url reassembly
groupBy all share ONE hashpartitioning on url (plan-asserted).  No
joins, no Python — at 10^12 pages this is one shuffle of short token
rows, the same exchange discipline as CETR.

Page set: the SAME synthesized corpus as CETR/jusText/Arc90
(``webcetr.synth_cetr_pages`` / ``webcetr.PAGES_SQL``) so extractor
families stay comparable; the nav/sidebar/footer lines are tag-dense
(negative runs) and the two paragraphs are word-dense (positive runs),
making the recovered span non-vacuous by construction.

Reference scope anchor: the reference's extraction surface is
``src/core/markdown-processor.ts`` + ``src/core/pdf-to-md.ts`` (page
text assembly); BTE is a beyond-reference web-scale operator per the
brief's north_rule ("HTML boilerplate strip ... DOM heuristics").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .webcetr import PAGES_SQL, synth_cetr_pages

# running-min key = (pre + PRE_OFF) * KPOS + prefix_index
PRE_OFF = 1_000_000_000  # |prefix sum| bound (tokens per page)
KPOS = 1_000_000_000  # index field width in the running-min key
# page argmax key = (score + SC_OFF)*ENC_SCORE + (IDX_W - end)*ENC_END
#                   + span_start0  — fields never overlap because
#                   end, start0, |score| < IDX_W
SC_OFF = 1_000_000
IDX_W = 1_000_000
ENC_SCORE = 1_000_000_000_000
ENC_END = 1_000_000

_TOKEN_RE = r"<[^>]*>|[^\s<]+"
_SCRIPT_RE = r"(?is)<script\b.*?</script\s*>"


def bte_extract_frame(pages: DataFrame) -> DataFrame:
    """(url, html:binary) -> one row per url with the BTE span and the
    extracted body text (words inside the span, space-joined)."""
    toks = pages.select(
        "url",
        F.posexplode(
            F.regexp_extract_all(
                F.regexp_replace(
                    F.decode(F.col("html"), "UTF-8"), _SCRIPT_RE, ""
                ),
                F.lit(_TOKEN_RE),
                F.lit(0),
            )
        ).alias("pos", "tok"),
    ).select(
        "url",
        (F.col("pos") + 1).cast("bigint").alias("idx"),
        "tok",
        F.col("tok").startswith("<").cast("bigint").alias("is_tag"),
    )
    worder = Window.partitionBy("url").orderBy("idx")
    wpage = Window.partitionBy("url")
    empty_prefix_key = PRE_OFF * KPOS  # pre_0 = 0 at index 0
    pre = toks.withColumn(
        "pre", F.sum(F.lit(1) - 2 * F.col("is_tag")).over(worder)
    ).withColumn(
        "minkey",
        F.least(
            F.lit(empty_prefix_key),
            F.coalesce(
                F.min(
                    (F.col("pre") + PRE_OFF) * KPOS + F.col("idx")
                ).over(
                    worder.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(empty_prefix_key),
            ),
        ),
    )
    scored = pre.withColumn(
        "end_score",
        F.col("pre") - (F.expr(f"minkey div {KPOS}") - PRE_OFF),
    ).withColumn(
        "best_enc",
        F.max(
            (F.col("end_score") + SC_OFF) * ENC_SCORE
            + (IDX_W - F.col("idx")) * ENC_END
            + F.col("minkey") % KPOS
        ).over(wpage),
    )
    spans = scored.select(
        "url", "idx", "tok", "is_tag",
        (F.expr(f"best_enc div {ENC_SCORE}") - SC_OFF).alias("score"),
        (F.col("best_enc") % ENC_SCORE % ENC_END + 1).alias(
            "span_start"
        ),
        (IDX_W - F.expr(f"(best_enc % {ENC_SCORE}) div {ENC_END}"))
        .alias("span_end"),
    )
    in_body = (
        (F.col("idx") >= F.col("span_start"))
        & (F.col("idx") <= F.col("span_end"))
        & (F.col("is_tag") == 0)
    )
    return spans.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("is_tag").alias("n_tags"),
        F.max("score").alias("score"),
        F.max("span_start").alias("span_start"),
        F.max("span_end").alias("span_end"),
        F.sum(in_body.cast("bigint")).alias("n_body_words"),
        F.array_join(
            F.transform(
                # collect_list drops nulls, so the when() keeps only
                # body words; array_sort on (idx, tok) structs orders
                # by idx first
                F.array_sort(
                    F.collect_list(
                        F.when(in_body, F.struct("idx", "tok"))
                    )
                ),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("body_text"),
    )


def bte_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return bte_extract_frame(synth_cetr_pages(docs))


BTE_EXTRACT_SQL = f"""
WITH pages AS ({PAGES_SQL}),
tk AS (
  SELECT url,
         unnest(range(1, len(ts) + 1))::BIGINT AS idx,
         unnest(ts) AS tok
  FROM (
    SELECT url,
           regexp_extract_all(
             regexp_replace(page, '{_SCRIPT_RE}', '', 'g'),
             '{_TOKEN_RE}') AS ts
    FROM pages)
),
sg AS (
  SELECT url, idx, tok,
         (CASE WHEN tok LIKE '<%' THEN 1 ELSE 0 END)::BIGINT AS is_tag
  FROM tk
),
pr AS (
  SELECT url, idx, tok, is_tag,
         sum(1 - 2 * is_tag) OVER (
           PARTITION BY url ORDER BY idx
           ROWS UNBOUNDED PRECEDING)::BIGINT AS pre
  FROM sg
),
mk AS (
  SELECT url, idx, tok, is_tag, pre,
         least({PRE_OFF}::BIGINT * {KPOS},
               coalesce(min((pre + {PRE_OFF}) * {KPOS} + idx) OVER (
                          PARTITION BY url ORDER BY idx
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING),
                        {PRE_OFF}::BIGINT * {KPOS})) AS minkey
  FROM pr
),
sc AS (
  SELECT url, idx, tok, is_tag,
         pre - (minkey // {KPOS} - {PRE_OFF}) AS end_score,
         minkey % {KPOS} AS start0
  FROM mk
),
be AS (
  SELECT url, idx, tok, is_tag,
         max((end_score + {SC_OFF}) * {ENC_SCORE}
             + ({IDX_W} - idx) * {ENC_END} + start0) OVER (
           PARTITION BY url) AS best_enc
  FROM sc
),
sp AS (
  SELECT url, idx, tok, is_tag,
         (best_enc // {ENC_SCORE} - {SC_OFF})::BIGINT AS score,
         (best_enc % {ENC_SCORE} % {ENC_END} + 1)::BIGINT
           AS span_start,
         ({IDX_W} - (best_enc % {ENC_SCORE}) // {ENC_END})::BIGINT
           AS span_end
  FROM be
)
SELECT url,
       count(*)::BIGINT AS n_tokens,
       sum(is_tag)::BIGINT AS n_tags,
       max(score) AS score,
       max(span_start) AS span_start,
       max(span_end) AS span_end,
       sum(CASE WHEN idx BETWEEN span_start AND span_end
                 AND is_tag = 0 THEN 1 ELSE 0 END)::BIGINT
         AS n_body_words,
       coalesce(string_agg(tok, ' ' ORDER BY idx)
                  FILTER (WHERE idx BETWEEN span_start AND span_end
                                AND is_tag = 0),
                '') AS body_text
FROM sp
GROUP BY url
"""


QUERIES: dict[str, tuple] = {
    "web_bte_extract": (bte_extract, BTE_EXTRACT_SQL),
}
