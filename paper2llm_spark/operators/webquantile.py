"""Log-bucket quantile sketch — the bounded-state length-distribution
summary every corpus dashboard needs (HDRHistogram's logarithmic
buckets, Prometheus' exponential histograms, DataSketches' REQ all
use the same trick: if only order-of-magnitude accuracy is needed,
a base-2 histogram IS the quantile sketch, and it merges by adding
counters).

Semantics (frozen): every document's ``n_chars`` lands in bucket
``ilog2(max(n_chars, 1))``, computed EXACTLY in both engines as
``length(bin(v)) - 1`` — the bit-length of the value, no floating
``log2`` anywhere (``log2(2^53±ulp)`` boundary rounding is precisely
the class of cross-engine drift the bin() trick eliminates).  Output
one row per occupied bucket with its covered range ``[lo, hi]``, the
bucket count, and the running cumulative count in bucket order —
the CDF staircase a quantile lookup walks.

Relative error by construction: any quantile estimate drawn from the
staircase is within a factor of 2 of the true order statistic (the
bucket width), regardless of corpus size.

Plan shape (the scale story): bucket assignment is codegen in the
scan; groupBy(bucket) collapses 10^12 rows to <= 64 partials via
map-side combine (8-byte keys, 8-byte counts — the whole shuffle is
under 1 KB per task); the cumulative window runs over <= 64 rows.
The sketch state is bounded by the VALUE RANGE (64 buckets for any
bigint), never by the corpus, and two corpus halves merge by adding
bucket counts — pytest-asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def quantile_buckets_frame(vals: DataFrame) -> DataFrame:
    """Single-column frame ``v`` -> log2-bucket CDF staircase."""
    bucket = (
        F.length(F.bin(F.greatest(F.col("v"), F.lit(1)))) - 1
    ).cast("long")
    hist = (
        vals.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    w = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return hist.select(
        "bucket",
        F.expr("shiftleft(1L, int(bucket))").cast("long").alias("lo"),
        (F.expr("shiftleft(1L, int(bucket) + 1)") - 1)
        .cast("long").alias("hi"),
        "n_docs",
        F.sum("n_docs").over(w).cast("long").alias("cum_docs"),
    )


def quantile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return quantile_buckets_frame(docs.select(F.col("n_chars").alias("v")))


QUANTILE_BUCKETS_SQL = """
WITH b AS (
  SELECT (length(bin(greatest(n_chars, 1))) - 1)::BIGINT AS bucket
  FROM documents
),
hist AS (
  SELECT bucket, count(*)::BIGINT AS n_docs FROM b GROUP BY bucket
)
SELECT bucket,
       (1::BIGINT << bucket)::BIGINT AS lo,
       ((1::BIGINT << (bucket + 1)) - 1)::BIGINT AS hi,
       n_docs,
       (sum(n_docs) OVER (ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       )::BIGINT AS cum_docs
FROM hist
"""


QUERIES: dict[str, tuple] = {
    "sketch_quantile_buckets": (quantile_buckets, QUANTILE_BUCKETS_SQL),
}
