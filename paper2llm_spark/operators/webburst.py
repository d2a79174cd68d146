"""Word burstiness (Church & Gale 1995, "Poisson mixtures"; Katz 1996)
— a word's tendency to RECUR within the documents it appears in at
all.  Content words are bursty (a page about zebras says "zebra"
many times), function words are not; burstiness separates them where
raw frequency cannot (both "zebra" and "the" may have the same tf in
some corpus slice).  Curation uses it to pick topical keywords and
to spot template/spam vocabulary: boilerplate phrases have burst ≈ 1
at huge df — they appear once per page, everywhere.

Semantics (frozen): lowercased whitespace tokens; per word with
``df >= MIN_DF``: ``tf`` = total corpus occurrences, ``df`` =
documents containing it, and the mean within-document recurrence in
exact integer micro-units::

    burst_micro = 1_000_000 · tf div df

(Church & Gale's E[tf | tf > 0]; their full Poisson-mixture fit is a
float EM — this emits the exact sufficient statistics, estimator
fitting stays driver-side, the HLL/CMS split.)  Output:
``(w, tf, df, burst_micro)``.

Plan shape (the scale story): stage 1 collapses (doc, word) pairs in
a map-side-combinable groupBy — the exchanged rows are already
per-document counts, not per-occurrence tokens; stage 2 folds those
into (word, tf, df) — vocabulary-sized.  Two short-row exchanges
total, the second over Heaps-bounded input.  Zero joins, zero
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, tokens

MIN_DF = 3


def word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return burstiness_frame(docs)


def burstiness_frame(docs: DataFrame) -> DataFrame:
    per_doc = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        per_doc.groupBy("w")
        .agg(
            F.sum("c").cast("bigint").alias("tf"),
            F.count(F.lit(1)).cast("bigint").alias("df"),
        )
        .filter(F.col("df") >= MIN_DF)
        .select(
            "w", "tf", "df", F.expr("1000000 * tf div df").alias("burst_micro")
        )
    )


_TOK = SQL_TOKENS.format(expr="text")

BURST_SQL = f"""
WITH t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
pd AS (SELECT doc_id, w, count(*) AS c
       FROM t, unnest(tok) AS u(w) GROUP BY 1, 2),
agg AS (SELECT w, sum(c)::BIGINT AS tf, count(*)::BIGINT AS df
        FROM pd GROUP BY w)
SELECT w, tf, df, (1000000 * tf // df)::BIGINT AS burst_micro
FROM agg WHERE df >= {MIN_DF}
"""


QUERIES: dict[str, tuple] = {
    "corpus_word_burstiness": (word_burstiness, BURST_SQL),
}
