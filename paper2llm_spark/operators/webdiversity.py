"""Source-diversity profile — per-language Shannon entropy of the
source distribution plus concentration summaries (top-source share,
source count).  Corpus datasheets (Gebru et al. 2021; the Dolma and
FineWeb release cards) publish exactly this: a language whose bytes
come 95% from one source is a provenance risk and a dedup/contamination
amplifier regardless of document-level quality.

Exact integer math (the engine's micro-nat discipline): for language L
with per-source doc counts ``c_i`` summing to ``T``,

    mnat_i        = floor(ln(T/c_i) * 1e6 + 0.5)      -- ONE double ln
                                                      -- per (L, source),
                                                      -- shape-identical
                                                      -- in both engines
    entropy_micro = sum(c_i * mnat_i) div T           -- exact bigint

so the per-row quantization is the only float step and the cross-row
sum (where Spark's aggregation order is nondeterministic) is exact.
``c_i * mnat_i`` stays under 2^63 while ``c_i < ~3e11`` docs per
(language, source) cell; past that production divides the counts
by 1e3 before weighting (entropy is scale-free in the weights),
documented here.

Plan shape (the scale story): ONE corpus-sized exchange — the
map-side-combinable ``groupBy(lang, source)`` count (short rows).
The per-language total re-enters via a window over the
|langs × sources|-bounded cell table (partitioned by lang — thousands
of rows at web scale, not corpus rows), and the final ``groupBy(lang)``
collapses each language to four bigints.  Zero joins, zero Python.

Reference scope anchor: beyond-reference web-scale operator (corpus
accounting tier); companion of `corpus_datasheet` (totals/dup-rate
card) and `corpus_domain_stats`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def source_entropy_frame(docs: DataFrame) -> DataFrame:
    cells = docs.groupBy("lang", "source").agg(
        F.count("*").cast("bigint").alias("c")
    )
    w = Window.partitionBy("lang")
    staged = cells.withColumn(
        "t", F.sum("c").over(w).cast("bigint")
    ).withColumn(
        "mnat",
        F.expr(
            "cast(floor(ln(cast(t as double) / cast(c as double))"
            f" * {MICRO} + 0.5) as bigint)"
        ),
    )
    return staged.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_sources"),
        F.expr("sum(c * mnat) div max(t)").cast("bigint")
        .alias("entropy_micro_nats"),
        F.expr(f"(max(c) * {MICRO}) div max(t)").cast("bigint")
        .alias("top_share_micro"),
    )


def source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("lang", "source")
    return source_entropy_frame(docs)


SOURCE_ENTROPY_SQL = f"""
WITH cells AS (
  SELECT lang, source, count(*)::BIGINT AS c
  FROM documents GROUP BY 1, 2
),
staged AS (
  SELECT lang, c,
         sum(c) OVER (PARTITION BY lang)::BIGINT AS t
  FROM cells
),
m AS (
  SELECT lang, c, t,
         floor(ln(t::DOUBLE / c::DOUBLE) * {MICRO} + 0.5)::BIGINT AS mnat
  FROM staged
)
SELECT lang,
       sum(c)::BIGINT AS n_docs,
       count(*)::BIGINT AS n_sources,
       (sum(c * mnat)::BIGINT // max(t))::BIGINT AS entropy_micro_nats,
       ((max(c) * {MICRO}) // max(t))::BIGINT AS top_share_micro
FROM m GROUP BY 1
"""


QUERIES: dict[str, tuple] = {
    "corpus_source_entropy": (source_entropy, SOURCE_ENTROPY_SQL),
}
