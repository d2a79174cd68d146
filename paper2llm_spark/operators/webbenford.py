"""Benford first-digit profile (Benford 1938; Newcomb 1881) — the
generated-content tell for NUMBERS.  Organic numeric text (prices,
populations, measurements, citation counts) follows the logarithmic
first-digit law; template-generated and synthetic spam pages draw
digits uniformly, and the divergence is the classic forensic signal
(Nigrini's fraud auditing turned it into standard practice).
Complements this repo's text-side spam tells (title stuffing,
template lines, homoglyphs) with the numeric channel.

The fixture corpus's word-salad text carries NO digit runs, so BOTH
polarities are planted in-engine (an organic corpus contributes its
own sources for free): source ``'benford100'`` re-enters with a
100-number body whose first-digit counts are the Benford milli table
div 10 (low divergence), source ``'uniform9'`` with digits 1..9 once
each (the generated-content shape, high divergence) — the gate
certifies the statistic SEPARATES them.

Semantics (frozen): per ``source``, pool the first digits of every
maximal digit run in ``text`` that does NOT start with '0' (leading
zeros mark codes/ids, not magnitudes — Nigrini's screening rule);
runs obtained by RE2-safe splitting on non-digits.  Expected Benford
mass in EXACT MILLI units is the frozen literal table ``[301, 176,
125, 97, 79, 67, 58, 51, 46]`` (floor(log10(1+1/d)*1000+0.5)).  The
divergence statistic is the chi-square-shaped exact integer
``chi_milli = sum_d (1000*n_d - e_d*N)^2 div (e_d*N)`` (cleared
denominators; monotone in Pearson's chi2).  The uniform polarity is
PLANTED in-engine: a synthetic source ``'uniform9'`` re-enters one
doc per seed doc with digits 1..9 each once — exactly uniform, high
divergence.  Output per source: ``(source, n_numbers, top_digit,
chi_milli)``.

Plan shape (the scale story): digit-run extraction and first-digit
mapping are scan-side HOFs (split + filter + transform); ONE
map-side-combinable groupBy(source, digit) collapses the corpus to
<= 9*|sources| rows; the chi fold is a conditional-sum pivot over
the collapsed table.  Zero joins beyond the 9-row pivot, zero
Python (plan-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BENFORD_MILLI = [301, 176, 125, 97, 79, 67, 58, 51, 46]
PLANT_MOD = 101
# 100 numbers distributed per the milli table div 10: [30,17,12,...]
_BENFORD_TEXT = " ".join(
    " ".join([str(d)] * (BENFORD_MILLI[d - 1] // 10))
    for d in range(1, 10)
)
_UNIFORM_TEXT = "1 2 3 4 5 6 7 8 9"


def _first_digits(col):
    runs = F.filter(
        F.split(col, r"[^0-9]+"),
        lambda s: (s != "") & (F.substring(s, 1, 1) != "0"),
    )
    return F.transform(runs, lambda s: F.substring(s, 1, 1))


def benford_frame(docs: DataFrame) -> DataFrame:
    digits = docs.select(
        "source",
        F.explode(_first_digits(F.col("text"))).alias("dg"),
    ).select("source", F.col("dg").cast("int").alias("dg"))
    counts = digits.groupBy("source", "dg").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    pivot = counts.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_numbers"),
        *[
            F.sum(F.when(F.col("dg") == d, F.col("c")).otherwise(0))
            .cast("bigint").alias(f"c{d}")
            for d in range(1, 10)
        ],
    )
    chi = " + ".join(
        f"(1000 * c{d} - {BENFORD_MILLI[d - 1]} * n_numbers)"
        f" * (1000 * c{d} - {BENFORD_MILLI[d - 1]} * n_numbers)"
        f" div ({BENFORD_MILLI[d - 1]} * n_numbers)"
        for d in range(1, 10)
    )
    top = "array_position(array({}), array_max(array({})))".format(
        ", ".join(f"c{d}" for d in range(1, 10)),
        ", ".join(f"c{d}" for d in range(1, 10)),
    )
    return pivot.filter(F.col("n_numbers") > 0).select(
        "source", "n_numbers",
        F.expr(top).cast("bigint").alias("top_digit"),
        F.expr(chi).cast("bigint").alias("chi_milli"),
    )


def benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    ).repartition(spark.sparkContext.defaultParallelism)
    seed = docs.filter(F.col("doc_id") % PLANT_MOD == 0)
    uni = seed.select(
        "doc_id",
        F.lit("uniform9").alias("source"),
        F.lit(_UNIFORM_TEXT).alias("text"),
    )
    ben = seed.select(
        "doc_id",
        F.lit("benford100").alias("source"),
        F.lit(_BENFORD_TEXT).alias("text"),
    )
    return benford_frame(docs.unionByName(uni).unionByName(ben))


_CHI = " + ".join(
    f"(1000 * c{d} - {BENFORD_MILLI[d - 1]} * n_numbers)"
    f" * (1000 * c{d} - {BENFORD_MILLI[d - 1]} * n_numbers)"
    f" // ({BENFORD_MILLI[d - 1]} * n_numbers)"
    for d in range(1, 10)
)
_TOP = "list_position([{}], list_max([{}]))".format(
    ", ".join(f"c{d}" for d in range(1, 10)),
    ", ".join(f"c{d}" for d in range(1, 10)),
)

BENFORD_SQL = f"""
WITH corpus AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT 'uniform9', '{_UNIFORM_TEXT}'
  FROM documents WHERE doc_id % {PLANT_MOD} = 0
  UNION ALL
  SELECT 'benford100', '{_BENFORD_TEXT}'
  FROM documents WHERE doc_id % {PLANT_MOD} = 0
),
digits AS (
  SELECT source, dg
  FROM (
    SELECT source,
           unnest(list_transform(
             list_filter(string_split_regex(text, '[^0-9]+'),
               s -> s <> '' AND substr(s, 1, 1) <> '0'),
             s -> substr(s, 1, 1)::INT)) AS dg
    FROM corpus)
),
counts AS (SELECT source, dg, count(*)::BIGINT AS c
           FROM digits GROUP BY 1, 2),
pv AS (
  SELECT source, sum(c)::BIGINT AS n_numbers,
         {", ".join(
             f"sum(CASE WHEN dg = {d} THEN c ELSE 0 END)::BIGINT AS c{d}"
             for d in range(1, 10)
         )}
  FROM counts GROUP BY 1
)
SELECT source, n_numbers,
       ({_TOP})::BIGINT AS top_digit,
       ({_CHI})::BIGINT AS chi_milli
FROM pv WHERE n_numbers > 0
"""


QUERIES: dict[str, tuple] = {
    "text_benford_profile": (benford_profile, BENFORD_SQL),
}
