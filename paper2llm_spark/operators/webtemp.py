"""Temperature-scaled multilingual sampling — the XLM/mBERT corpus
balancing rule (Conneau & Lample 2019 §3.1; Devlin et al.'s
exponentiated smoothing): resample language ``l`` with probability
``q_l ∝ p_l^(1/T)`` so high-resource languages stop drowning the
tail; ``T = 2`` (α = 0.5) is the classic setting.

Exact cross-engine arithmetic WITHOUT float-sum order risk: IEEE-754
``sqrt`` is correctly rounded in both engines (JVM ``Math.sqrt``,
DuckDB ``std::sqrt``), so the only float op is the deterministic
per-language ``sqrt_micro = floor(sqrt(n_l)·1e6 + 0.5)``; the
normalizer is then the EXACT bigint sum of those micros (a float
``sum(sqrt(p))`` would round differently under Spark's nondeterministic
aggregation order), and every ratio is cleared-denominator integer
division.

Outputs per language: corpus share ``p_micro``, temperature share
``q_micro``, and ``boost_micro = 1e6·q/p`` (>1e6 = oversample — the
number a sampling stage multiplies into per-doc keep probability).

Plan shape: ONE map-side-combinable ``groupBy(lang)`` count (the
corpus collapses to |langs| rows scan-side); the normalizer re-enters
by 1-row broadcast crossJoin — same discipline as
``corpus_mixture_plan``.  ``text`` is never read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TEMPERATURE = 2  # T; alpha = 1/T = 0.5 -> sqrt


def temperature_mix_frame(docs: DataFrame) -> DataFrame:
    counts = docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    counts = counts.withColumn(
        "sqrt_micro",
        F.floor(F.sqrt(F.col("n_docs")) * 1e6 + F.lit(0.5)).cast("bigint"),
    )
    totals = counts.agg(
        F.sum("n_docs").cast("bigint").alias("n_total"),
        F.sum("sqrt_micro").cast("bigint").alias("denom"),
    )
    j = counts.crossJoin(F.broadcast(totals))
    return j.select(
        "lang", "n_docs",
        F.expr("cast(1000000 * n_docs div n_total as bigint)")
        .alias("p_micro"),
        F.expr("cast(1000000 * sqrt_micro div denom as bigint)")
        .alias("q_micro"),
        # greatest(p_micro, 1): a language with corpus share < 1e-6
        # floors to p_micro = 0 — Spark div would yield NULL but DuckDB
        # // raises division-by-zero and aborts the whole oracle.  The
        # guard (identical both sides) caps the reported boost at
        # q_micro * 1e6 for such ultra-tail languages.
        F.expr(
            "cast((1000000 * (1000000 * sqrt_micro div denom))"
            " div greatest(1000000 * n_docs div n_total, 1) as bigint)"
        ).alias("boost_micro"),
    )


def temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return temperature_mix_frame(docs)


TEMPERATURE_SQL = """
WITH c AS (
  SELECT lang, count(*)::BIGINT AS n_docs,
         floor(sqrt(count(*)) * 1e6 + 0.5)::BIGINT AS sqrt_micro
  FROM documents GROUP BY lang
),
t AS (
  SELECT sum(n_docs)::BIGINT AS n_total,
         sum(sqrt_micro)::BIGINT AS denom
  FROM c
)
SELECT lang, n_docs,
       (1000000 * n_docs // n_total)::BIGINT AS p_micro,
       (1000000 * sqrt_micro // denom)::BIGINT AS q_micro,
       ((1000000 * (1000000 * sqrt_micro // denom))
        // greatest(1000000 * n_docs // n_total, 1))::BIGINT AS boost_micro
FROM c, t
"""


QUERIES: dict[str, tuple] = {
    "corpus_temperature_mix": (temperature_mix, TEMPERATURE_SQL),
}
