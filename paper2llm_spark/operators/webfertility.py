"""Tokenizer fertility by language — the tokenizer-equity table
(Ács' fertility analyses and the NLLB/UniMax debates made
per-language tokens-per-word THE fairness statistic for a shared
vocabulary: high-fertility languages pay more compute per word and
burn context window faster; a mixture plan reads this table next
to the UniMax budgets).

Composes the registered BPE apply verbatim (`text_bpe_token_count`
— trained vocabulary, broadcast segmentation) and rolls it up per
language with exact integers.

Semantics (frozen): per lang over the BPE-scored docs:
``n_docs``, ``total_words``, ``total_bpe_tokens``, ``total_chars``
(the corpus `n_chars` column), ``fertility_micro = total_bpe_tokens
* 1e6 div total_words`` (token-weighted corpus fertility),
``tokens_per_kchar_micro = total_bpe_tokens * 1e9 div
greatest(total_chars, 1)`` — tokens per 1000 chars in micro, the
byte-budget view.

Plan shape (the scale story): the BPE pipeline is the composed
cost; the rollup joins its per-doc output to the (doc_id, lang,
n_chars) projection on doc_id short rows and collapses map-side to
|langs| rows.  Zero Python; ``text`` never read by the audit
layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bpe import BPE_TOKEN_COUNT_SQL, bpe_token_count

MICRO = 1_000_000


def fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_doc = bpe_token_count(spark, sf_dir).select(
        "doc_id", "n_words", "bpe_tokens"
    )
    meta = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    return (
        per_doc.join(meta, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("total_words"),
            F.sum("bpe_tokens").cast("bigint").alias("total_bpe_tokens"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "total_words",
            "total_bpe_tokens",
            "total_chars",
            F.expr(f"total_bpe_tokens * {MICRO} div total_words")
            .cast("bigint").alias("fertility_micro"),
            F.expr(
                f"total_bpe_tokens * {MICRO} * 1000"
                f" div greatest(total_chars, 1)"
            ).cast("bigint").alias("tokens_per_kchar_micro"),
        )
    )


FERTILITY_SQL = f"""
WITH per_doc AS (
  SELECT doc_id, n_words, bpe_tokens FROM ({BPE_TOKEN_COUNT_SQL})
),
rolled AS (
  SELECT d.lang,
         count(*)::BIGINT AS n_docs,
         sum(p.n_words)::BIGINT AS total_words,
         sum(p.bpe_tokens)::BIGINT AS total_bpe_tokens,
         sum(d.n_chars)::BIGINT AS total_chars
  FROM per_doc p JOIN documents d USING (doc_id)
  GROUP BY 1
)
SELECT lang, n_docs, total_words, total_bpe_tokens, total_chars,
       (total_bpe_tokens * {MICRO} // total_words)::BIGINT
         AS fertility_micro,
       (total_bpe_tokens * {MICRO} * 1000
        // greatest(total_chars, 1))::BIGINT AS tokens_per_kchar_micro
FROM rolled
"""


QUERIES: dict[str, tuple] = {
    "corpus_fertility_by_lang": (fertility_by_lang, FERTILITY_SQL),
}
