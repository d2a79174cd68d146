"""Zipf / Heaps corpus profile — the rank-frequency power-law slope
and vocabulary-growth exponent every corpus release publishes
(C4/Gopher/RefinedWeb report token and vocabulary distributions; a
Zipf slope far from -1 or a Heaps exponent near 0/1 flags template
spam or OCR noise before training).

Per language:

* term frequencies -> rank (freq desc, term asc tiebreak);
* Zipf OLS fit of ``ln freq ~ ln rank`` with EXACT integer sums: each
  point is quantized once to milli-nats (``floor(ln(v)*1000 + 0.5)``,
  one shape-identical double ``ln`` per value — the weblm discipline),
  then n, Σx, Σy, Σxy, Σx² are exact bigint aggregates (milli keeps
  ``n·Σxy`` and ``Σx·Σy`` under 2^63 for vocabularies to ~10^5; a
  float regression would round differently under Spark's
  nondeterministic agg order);
* ``slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)`` and the intercept are
  the ONLY float divisions — both operands exact bigints, the
  expression shape identical in both engines, result floored to
  micro-units;
* Heaps ``β = ln V / ln N`` (the single-point estimator of
  ``V = K·N^β``), same double-ln discipline.

Plan shape (the scale story): one explode feeds ONE map-side
combinable ``groupBy(lang, term)`` — the only corpus-sized exchange
carries (lang, term, partial count) short rows; the rank window runs
on the vocabulary-bounded frequency table (Heaps-law rows, not corpus
rows) partitioned by lang; the final ``groupBy(lang)`` collapses to
|langs| rows of five bigint sums.  Zero joins, zero Python
(plan-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, tokens

MILLI = 1_000
MICRO = 1_000_000


def zipf_profile_frame(docs: DataFrame) -> DataFrame:
    tf = (
        docs.select("lang", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("freq").desc(), F.col("term").asc())
    xy = tf.select(
        "lang", "freq",
        F.row_number().over(w).cast("bigint").alias("rank"),
    ).select(
        "lang", "freq",
        F.expr(f"cast(floor(ln(cast(rank as double)) * {MILLI} + 0.5)"
               " as bigint)").alias("x"),
        F.expr(f"cast(floor(ln(cast(freq as double)) * {MILLI} + 0.5)"
               " as bigint)").alias("y"),
    )
    agg = xy.groupBy("lang").agg(
        F.count("*").alias("n_terms"),
        F.sum("freq").alias("n_tokens"),
        F.max("freq").alias("top_freq"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    fit = agg.select(
        "lang", "n_terms", "n_tokens", "top_freq", "sx", "sy",
        (F.col("n_terms") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .alias("num"),
        (F.col("n_terms") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .alias("den"),
    )
    return fit.select(
        "lang", "n_terms", "n_tokens", "top_freq",
        F.expr(
            "case when den > 0 then "
            f"cast(floor(num / den * {MICRO}.0 + 0.5) as bigint) end"
        ).alias("zipf_slope_micro"),
        F.expr(
            "case when den > 0 then "
            f"cast(floor((sy - num / den * sx) / n_terms * {MILLI}.0"
            " + 0.5) as bigint) end"
        ).alias("zipf_intercept_micro"),
        F.expr(
            "case when n_terms >= 2 and n_tokens >= 2 then "
            "cast(floor(ln(cast(n_terms as double))"
            " / ln(cast(n_tokens as double))"
            f" * {MICRO}.0 + 0.5) as bigint) end"
        ).alias("heaps_beta_micro"),
    )


def zipf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return zipf_profile_frame(docs)


_TOK = SQL_TOKENS.format(expr="text")

ZIPF_PROFILE_SQL = f"""
WITH tok AS (SELECT lang, unnest({_TOK}) AS term FROM documents),
tf AS (
  SELECT lang, term, count(*)::BIGINT AS freq FROM tok GROUP BY 1, 2
),
rk AS (
  SELECT lang, freq,
         row_number() OVER (PARTITION BY lang
             ORDER BY freq DESC, term ASC)::BIGINT AS rank
  FROM tf
),
xy AS (
  SELECT lang, freq,
         floor(ln(rank::DOUBLE) * {MILLI} + 0.5)::BIGINT AS x,
         floor(ln(freq::DOUBLE) * {MILLI} + 0.5)::BIGINT AS y
  FROM rk
),
ag AS (
  SELECT lang,
         count(*)::BIGINT AS n_terms,
         sum(freq)::BIGINT AS n_tokens,
         max(freq)::BIGINT AS top_freq,
         sum(x)::BIGINT AS sx,
         sum(y)::BIGINT AS sy,
         sum(x * y)::BIGINT AS sxy,
         sum(x * x)::BIGINT AS sxx
  FROM xy GROUP BY lang
),
fit AS (
  SELECT lang, n_terms, n_tokens, top_freq, sx, sy,
         n_terms * sxy - sx * sy AS num,
         n_terms * sxx - sx * sx AS den
  FROM ag
)
SELECT lang, n_terms, n_tokens, top_freq,
       CASE WHEN den > 0 THEN
         floor(num / den * {MICRO}.0 + 0.5)::BIGINT END
         AS zipf_slope_micro,
       CASE WHEN den > 0 THEN
         floor((sy - num / den * sx) / n_terms * {MILLI}.0 + 0.5)::BIGINT
         END AS zipf_intercept_micro,
       CASE WHEN n_terms >= 2 AND n_tokens >= 2 THEN
         floor(ln(n_terms::DOUBLE) / ln(n_tokens::DOUBLE)
               * {MICRO}.0 + 0.5)::BIGINT END AS heaps_beta_micro
FROM fit
"""


QUERIES: dict[str, tuple] = {
    "corpus_zipf_profile": (zipf_profile, ZIPF_PROFILE_SQL),
}
