"""Good-Turing frequency re-estimation (Good 1953, "The population
frequencies of species and the estimation of population parameters";
the smoothing base of Katz backoff and the classic way to estimate
unseen-mass in a corpus).  Curation pipelines read the
frequency-of-frequencies table to size vocabulary cutoffs and to
estimate how much of the long tail another crawl snapshot would add
(the Turing estimate of unseen probability mass is N_1 / N).

Semantics (frozen): lowercased whitespace tokens; ``r`` = a word's
total corpus occurrence count, ``n_r`` = how many distinct words
occur exactly r times (the frequency-of-frequencies table), and the
raw Turing re-estimate in exact integer micro-units::

    r_star_micro = 1_000_000 · (r + 1) · n_{r+1} div n_r

(0 where ``n_{r+1}`` is 0 — the raw formula's own value at a gap;
those are the rows the Gale-Sampson smoothing fits a regression
over, and the regression is a float fit, so this operator emits the
exact raw table and leaves curve-fitting driver-side, the same split
as the HLL/CMS estimators).  Output one row per occupied r:
``(r, n_r, r_star_micro)``.

Plan shape (the scale story): word counts are ONE map-side-combinable
groupBy(word) — the word-count shuffle — and the
frequency-of-frequencies table is a second groupBy over the ALREADY
COLLAPSED (word, count) rows (vocabulary-sized, Heaps-bounded, tiny
next to the corpus).  The r+1 lookup is a self-join of the r-table
with itself — at most thousands of rows, broadcast by construction.
Zero Python; nothing corpus-sized moves twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, tokens


def good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return good_turing_frame(docs)


def good_turing_frame(docs: DataFrame) -> DataFrame:
    wc = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    nr = wc.groupBy("r").agg(F.count(F.lit(1)).cast("bigint").alias("n_r"))
    nxt = nr.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1"))
    return (
        nr.join(nxt, "r", "left")
        .select(
            F.col("r").cast("bigint").alias("r"),
            "n_r",
            F.expr(
                "1000000 * (r + 1) * coalesce(n_r1, 0) div n_r"
            ).cast("bigint").alias("r_star_micro"),
        )
    )


_TOK = SQL_TOKENS.format(expr="text")

GOOD_TURING_SQL = f"""
WITH t AS (SELECT {_TOK} AS tok FROM documents),
wc AS (SELECT w, count(*) AS r FROM t, unnest(tok) AS u(w) GROUP BY w),
nr AS (SELECT r, count(*)::BIGINT AS n_r FROM wc GROUP BY r),
nxt AS (SELECT r - 1 AS r, n_r AS n_r1 FROM nr)
SELECT nr.r::BIGINT AS r, nr.n_r,
       (1000000 * (nr.r + 1) * coalesce(nxt.n_r1, 0) // nr.n_r)::BIGINT
         AS r_star_micro
FROM nr LEFT JOIN nxt ON nxt.r = nr.r
"""


QUERIES: dict[str, tuple] = {
    "corpus_good_turing": (good_turing, GOOD_TURING_SQL),
}
