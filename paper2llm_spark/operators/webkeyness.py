"""Keyness by log-likelihood ratio (Dunning 1993, "Accurate methods
for the statistics of surprise and coincidence" — the G² test) —
which words are over/under-represented in one corpus slice vs the
rest.  The standard corpus-linguistics comparison statistic (robust
at low counts where chi-square is not), and the curation question it
answers is constant: what does THIS source contribute that the rest
of the corpus doesn't — source vocabulary audits, domain-mixture
sanity checks, contamination forensics.

Semantics (frozen): focus slice A = ``source = 'src0'`` (the fixture
corpus's source column), reference B = everything else; lowercased
whitespace tokens; per word with ``a + b >= MIN_TOTAL``::

    G² = 2 · [ a·ln(a / E_a) + b·ln(b / E_b) ],
    E_a = N_A·(a+b)/(N_A+N_B),  E_b = N_B·(a+b)/(N_A+N_B)

with the x=0 term taken at its limit 0.  Each ln argument is
computed as one double division of EXACT bigint cross-products
(``a·(N_A+N_B)`` over ``N_A·(a+b)``), one shape-identical ``ln``
per term, exact micro rounding — the weblm.py discipline.
``overused = a·N_B > b·N_A`` (the sign, as an exact integer
cross-product).  Output: ``(w, cnt_a, cnt_b, g2_micro, overused)``.
Bigint range: cross-products stay under 2^63 while token totals are
< 2^31 per side; beyond that the products regroup as
``(a/E_a) = (a/(a+b)) · ((N_A+N_B)/N_A)`` — two double divisions,
same shape both engines (documented, not needed at fixture scale).

Plan shape (the scale story): word counts per side fold into ONE
map-side-combinable groupBy(word) carrying two conditional-sum
columns (never two scans, never a join of two count tables); the two
corpus totals re-enter as a 1-row broadcast crossJoin.  One corpus
exchange, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, tokens

FOCUS_SOURCE = "src0"
MIN_TOTAL = 10


def keyness_g2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return keyness_frame(docs)


def _g2_term(x: str, nx: str) -> str:
    # x * ln( (x * (na + nb)) / (nx * (a + b)) ); 0 at x = 0
    return (
        f"CASE WHEN {x} = 0 THEN cast(0.0 as double) ELSE"
        f" {x} * ln(({x} * (na + nb)) / ({nx} * (a + b))) END"
    )


def keyness_frame(docs: DataFrame) -> DataFrame:
    in_a = (F.col("source") == FOCUS_SOURCE).cast("bigint")
    wc = (
        docs.select(
            in_a.alias("ia"), F.explode(tokens(F.col("text"))).alias("w")
        )
        .groupBy("w")
        .agg(
            F.sum("ia").cast("bigint").alias("a"),
            F.sum(1 - F.col("ia")).cast("bigint").alias("b"),
        )
    )
    # totals AND the scored filter both read wc: pin it so the corpus
    # scan+explode+groupBy runs once, not once per branch
    wc = wc.localCheckpoint()
    totals = wc.agg(
        F.sum("a").cast("bigint").alias("na"),
        F.sum("b").cast("bigint").alias("nb"),
    )
    g2 = (
        f"floor(2e6 * (({_g2_term('a', 'na')}) + ({_g2_term('b', 'nb')}))"
        " + 0.5)"
    )
    return (
        wc.filter(F.col("a") + F.col("b") >= MIN_TOTAL)
        .crossJoin(F.broadcast(totals))
        .select(
            "w",
            F.col("a").alias("cnt_a"),
            F.col("b").alias("cnt_b"),
            F.expr(g2).cast("bigint").alias("g2_micro"),
            F.expr("a * nb > b * na").alias("overused"),
        )
    )


_TOK = SQL_TOKENS.format(expr="text")

KEYNESS_SQL = f"""
WITH t AS (SELECT (source = '{FOCUS_SOURCE}')::BIGINT AS ia, {_TOK} AS tok
           FROM documents),
wc AS (SELECT w, sum(ia)::BIGINT AS a, sum(1 - ia)::BIGINT AS b
       FROM t, unnest(tok) AS u(w) GROUP BY w),
totals AS (SELECT sum(a)::BIGINT AS na, sum(b)::BIGINT AS nb FROM wc)
SELECT w, a AS cnt_a, b AS cnt_b,
       floor(2e6 * (({_g2_term('a', 'na')}) + ({_g2_term('b', 'nb')}))
             + 0.5)::BIGINT AS g2_micro,
       a * nb > b * na AS overused
FROM wc, totals
WHERE a + b >= {MIN_TOTAL}
"""


QUERIES: dict[str, tuple] = {
    "corpus_keyness_g2": (keyness_g2, KEYNESS_SQL),
}
