"""Lexical-diversity battery — Yule's K, type-token ratio and hapax
share per document (Yule 1944, "The statistical study of literary
vocabulary"; Tweedie & Baayen 1998 survey).  Corpus curation uses
these as cheap repetition/health signals orthogonal to the Gopher
rules: machine-generated or template text collapses TTR and inflates
Yule's K (few types repeated often), while OCR shrapnel does the
opposite (a long tail of one-off garbage types pushes hapax share
toward 1).

Exact integer math per document over word frequencies ``f_t``
(N = Σf, V = |types|, S2 = Σf², hapax = |{t : f_t = 1}|):

* ``ttr_micro        = V * 1e6 div N``
* ``hapax_ratio_micro = hapax * 1e6 div V``
* ``yule_k_centi     = 1e4 * 100 * (S2 - N) div N²`` — Yule's
  characteristic K in centi-units (natural prose sits around
  K ~ 60-200; K = 0 iff every token is unique).

Magnitude: ``1e6 * (S2 - N) <= 1e6 * N²`` needs ``N < ~3e6`` tokens
per document to stay under 2^63 — far above any web page; past that,
production computes K from the (V-bounded) frequency-of-frequency
table with the product reduced first, documented here.

Plan shape (the scale story): one explode feeds ONE map-side
combinable ``groupBy(doc_id, term)``; the second ``groupBy(doc_id)``
collapses each document to four bigints.  Both exchanges carry short
rows; zero joins, zero Python (plan-asserted).  The frequency table is
Heaps-bounded per document, never corpus-wide.

Reference scope anchor: beyond-reference web-scale operator (text
quality tier); companion of `corpus_zipf_profile` (corpus-level
distribution) and `text_repetition_stats` (n-gram repetition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, tokens

MICRO = 1_000_000
YULE_SCALE = 10_000 * 100  # K in centi-units


def lexical_diversity_frame(docs: DataFrame) -> DataFrame:
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("f"))
    )
    agg = tf.groupBy("doc_id").agg(
        F.sum("f").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_types"),
        F.sum(F.col("f") * F.col("f")).cast("bigint").alias("s2"),
        F.sum((F.col("f") == 1).cast("bigint")).cast("bigint").alias("hapax"),
    )
    return agg.select(
        "doc_id", "n_tokens", "n_types",
        F.expr(f"(n_types * {MICRO}) div n_tokens").alias("ttr_micro"),
        F.expr(f"(hapax * {MICRO}) div n_types").alias("hapax_ratio_micro"),
        F.expr(
            f"({YULE_SCALE} * (s2 - n_tokens)) div (n_tokens * n_tokens)"
        ).alias("yule_k_centi"),
    )


def lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return lexical_diversity_frame(docs)


_TOK = SQL_TOKENS.format(expr="text")

LEXDIV_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS f FROM tok GROUP BY 1, 2),
agg AS (
  SELECT doc_id,
         sum(f)::BIGINT AS n_tokens,
         count(*)::BIGINT AS n_types,
         sum(f * f)::BIGINT AS s2,
         sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax
  FROM tf GROUP BY 1
)
SELECT doc_id, n_tokens, n_types,
       ((n_types * {MICRO}) // n_tokens)::BIGINT AS ttr_micro,
       ((hapax * {MICRO}) // n_types)::BIGINT AS hapax_ratio_micro,
       (({YULE_SCALE} * (s2 - n_tokens)) // (n_tokens * n_tokens))::BIGINT
         AS yule_k_centi
FROM agg
"""


QUERIES: dict[str, tuple] = {
    "text_lexical_diversity": (lexical_diversity, LEXDIV_SQL),
}
