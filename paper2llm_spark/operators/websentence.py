"""Sentence-level statistics — segmentation plus per-document length
distribution (sentence count, mean/max words, long-sentence share).
CCNet-lineage curation uses these as readability/garbage signals next
to the word-level Gopher rules: boilerplate lists segment into
hundreds of 2-3-word "sentences", while OCR reflow failures and
minified markup produce single multi-hundred-word run-ons — both
invisible to whole-document token counts.

Deterministic segmentation (no model, RE2-safe — neither engine gets
lookbehind): one GLOBAL ``regexp_replace('([.!?]) ' -> '$1<SOH>')``
marks boundaries with an unprintable sentinel (U+0001 cannot occur in
parquet-clean text), one split on the sentinel, trim, drop empties.
A document with no terminator is one sentence; an empty text yields
no row (empty-list unnest and filtered-array explode agree).

Exact integer outputs per document (w_i = words in sentence i):

* ``n_sentences``, ``max_words``
* ``mean_words_micro   = sum(w) * 1e6 div n_sentences``
* ``long_share_micro   = |{i : w_i > 30}| * 1e6 div n_sentences``

Plan shape (the scale story): ZERO exchanges — split, trim/filter,
per-sentence word counts and all four reductions are array HOFs in the
scan task's projection; the operator is embarrassingly parallel and
its cost is one pass over ``text``.  No joins, no Python, no
aggregation state beyond the row itself (plan-asserted).

Reference scope anchor: beyond-reference web-scale operator (text
quality tier); feeds the same keep/drop funnel as `corpus_gopher_rules`
and `text_readability` (which consumes sentence counts implicitly via
its own syllable/word formulas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MICRO = 1_000_000
LONG_WORDS = 30       # "run-on" threshold, words per sentence
_SENT_BOUND = r"([.!?]) "


def _sentence_word_counts() -> F.Column:
    """Array of per-sentence word counts for the ``text`` column."""
    marked = F.regexp_replace(F.col("text"), _SENT_BOUND, "$1\x01")
    sents = F.filter(
        F.transform(F.split(marked, "\x01"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    return F.transform(
        sents,
        lambda s: F.size(F.filter(F.split(F.lower(s), r"\s+"),
                                  lambda t: t != "")).cast("bigint"),
    )


def sentence_stats_frame(docs: DataFrame) -> DataFrame:
    wc = _sentence_word_counts().alias("wc")
    base = docs.select("doc_id", wc).filter(F.size("wc") > 0)
    return base.select(
        "doc_id",
        F.size("wc").cast("bigint").alias("n_sentences"),
        F.array_max("wc").cast("bigint").alias("max_words"),
        F.expr(
            f"aggregate(wc, 0L, (a, x) -> a + x) * {MICRO}"
            " div size(wc)"
        ).cast("bigint").alias("mean_words_micro"),
        F.expr(
            f"size(filter(wc, x -> x > {LONG_WORDS})) * cast({MICRO} as"
            " bigint) div size(wc)"
        ).cast("bigint").alias("long_share_micro"),
    )


def sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return sentence_stats_frame(docs)


SENTENCE_SQL = f"""
WITH seg AS (
  SELECT doc_id,
         list_filter(
           list_transform(
             string_split(
               regexp_replace(text, '{_SENT_BOUND}', '\\1' || chr(1), 'g'),
               chr(1)),
             s -> trim(s)),
           s -> s <> '') AS sents
  FROM documents
),
wcs AS (
  SELECT doc_id,
         list_transform(sents,
           s -> len(list_filter(string_split_regex(lower(s), '\\s+'),
                                t -> length(t) > 0))::BIGINT) AS wc
  FROM seg
  WHERE len(sents) > 0
)
SELECT doc_id,
       len(wc)::BIGINT AS n_sentences,
       list_max(wc)::BIGINT AS max_words,
       ((list_sum(wc)::BIGINT * {MICRO}) // len(wc))::BIGINT
         AS mean_words_micro,
       ((len(list_filter(wc, x -> x > {LONG_WORDS}))::BIGINT * {MICRO})
         // len(wc))::BIGINT AS long_share_micro
FROM wcs
"""


QUERIES: dict[str, tuple] = {
    "text_sentence_stats": (sentence_stats, SENTENCE_SQL),
}
