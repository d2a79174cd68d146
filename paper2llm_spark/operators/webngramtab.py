"""Pruned n-gram count table — the Web-1T artifact (Brants & Franz
2006, "Web 1T 5-gram Version 1"): corpus-wide counts of all 1/2/3-
grams above an occurrence threshold.  LM smoothing research, OOV
analysis, and contamination probes all start from this table; at
trillion-token scale it is THE canonical map-side-combine workload
(Google built it with exactly this shape of MapReduce job).

Semantics (frozen): lowercased whitespace tokens; n-grams are
space-joined for n in {1,2,3} (documents shorter than n tokens
contribute none for that n); a gram's count is its TOTAL occurrence
count across the corpus (not doc frequency — within-doc repeats all
count, faithful to Web-1T); only grams with count >= MIN_COUNT
survive (Web-1T pruned at 40 for unigrams / 10 for n>1; the fixture
corpus is ~10^5 tokens so one shared threshold keeps the table
non-trivial at every n).  Output: (n, gram, cnt).

Plan shape (the scale story): each doc emits its tagged grams from
ONE projection (the three per-n arrays concatenate before a single
explode — one generator, not three unioned scans); the groupBy(gram)
is the operator's ONE exchange and partial-aggregates map-side, so
what shuffles is (gram, partial_count) per distinct-gram-per-
partition, not per occurrence — the same reason word-count scales.
Pruning is post-aggregate by necessity (a gram's global count isn't
known earlier), exactly as Web-1T's reducer did it.  Skew: the
hottest unigram ("the") is still one shuffle row per map partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, sql_ngrams, tokens, word_ngrams

MIN_COUNT = 8


def ngram_counts_frame(docs: DataFrame) -> DataFrame:
    """doc_id, text -> (n, gram, cnt) rows with cnt >= MIN_COUNT."""
    tok = tokens(F.col("text"))
    tagged = F.concat(
        F.transform(word_ngrams(tok, 1), lambda g: F.concat(F.lit("1\t"), g)),
        F.transform(word_ngrams(tok, 2), lambda g: F.concat(F.lit("2\t"), g)),
        F.transform(word_ngrams(tok, 3), lambda g: F.concat(F.lit("3\t"), g)),
    )
    return (
        docs.select(F.explode(tagged).alias("tg"))
        .groupBy("tg")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .where(F.col("cnt") >= MIN_COUNT)
        .select(
            F.substring_index("tg", "\t", 1).cast("bigint").alias("n"),
            F.substring_index("tg", "\t", -1).alias("gram"),
            "cnt",
        )
    )


def ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return ngram_counts_frame(docs)


_TOK = SQL_TOKENS.format(expr="text")

NGRAM_COUNTS_SQL = f"""
WITH tk AS (SELECT {_TOK} AS tok FROM documents),
tagged AS (
  SELECT list_concat(
           list_transform({sql_ngrams('tok', 1)}, g -> '1' || chr(9) || g),
           list_concat(
             list_transform({sql_ngrams('tok', 2)}, g -> '2' || chr(9) || g),
             list_transform({sql_ngrams('tok', 3)}, g -> '3' || chr(9) || g)
           )
         ) AS tgs
  FROM tk
),
ex AS (SELECT tg FROM tagged, unnest(tgs) AS u(tg)),
counts AS (
  SELECT tg, count(*)::BIGINT AS cnt FROM ex GROUP BY tg
  HAVING count(*) >= {MIN_COUNT}
)
SELECT split_part(tg, chr(9), 1)::BIGINT AS n,
       split_part(tg, chr(9), 2) AS gram,
       cnt
FROM counts
"""


QUERIES: dict[str, tuple] = {
    "corpus_ngram_counts": (ngram_counts, NGRAM_COUNTS_SQL),
}
