"""Cardinality & frequency sketches — HyperLogLog (Flajolet et al.
2007) register construction and Count-Min (Cormode & Muthukrishnan
2005) counter construction: the two sketches every telemetry /
corpus-statistics pipeline carries ("how many distinct shingles /
URLs" and "roughly how often does each term occur") when exact
distinct-counts or per-key tables would be another corpus shuffle.
Spark's own ``approx_count_distinct`` IS HyperLogLog++ — this
operator materializes the REGISTERS as a table, which is the form
that merges across days/sources (max per bucket) and feeds the
estimator offline.

Exactness: the sketch CONTENTS are pure integer functions of md5 —
``bucket = h mod m``; HLL rank = leading-zero count of the remaining
52 bits computed as ``53 - length(bin(h div m))`` (both engines print
minimal binary strings — no float log2 anywhere); CMS counters are
plain bucket sums.  The float ESTIMATORS (harmonic mean, linear
counting) run driver-side in the tests, where both engines' inputs
are already bit-identical — accuracy is pytest-asserted against true
counts (HLL within the 1.04/sqrt(m) band; CMS never under-counts,
over-count bounded by e/w·total).

Plan shape: hash/rank/bucket are scan-side codegen; each sketch is
ONE map-side-combinable groupBy whose result is at most ``m`` (resp.
``d·w``) rows — partial aggregation means every partition ships a
bounded register/counter block regardless of corpus size, which is
the whole point of sketching at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, SQL_TRIGRAMS, tokens, word_trigrams
from .dedup import portable_hash60

HLL_M = 256      # registers (2^8); sigma = 1.04/sqrt(m) ~ 6.5%
CMS_D = 4        # count-min depth (independent hash rows)
CMS_W = 512      # count-min width


def hll_registers_frame(docs: DataFrame) -> DataFrame:
    """HLL register table over the corpus's distinct word trigrams."""
    sh = docs.select(tokens(F.col("text")).alias("tok")).select(
        F.explode(word_trigrams(F.col("tok"))).alias("sh")
    )
    h = sh.select(portable_hash60(F.col("sh")).alias("hv"))
    w = F.expr(f"hv div {HLL_M}")
    r = h.select(
        (F.col("hv") % HLL_M).cast("bigint").alias("bucket"),
        F.when(w == 0, F.lit(53))
        .otherwise(53 - F.length(F.bin(w)))
        .cast("bigint").alias("rank"),
    )
    return r.groupBy("bucket").agg(
        F.max("rank").cast("bigint").alias("max_rank")
    )


def hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return hll_registers_frame(docs)


def countmin_counts_frame(docs: DataFrame) -> DataFrame:
    """Count-Min counter table over token OCCURRENCES (d rows, w
    buckets; estimate(t) = min_j counter[j][h_j(t)])."""
    t = docs.select(tokens(F.col("text")).alias("tok")).select(
        F.explode(F.col("tok")).alias("term")
    )
    rows = None
    for j in range(CMS_D):
        rj = t.select(
            F.lit(j).cast("bigint").alias("row_idx"),
            (portable_hash60(F.concat(F.lit(f"cms{j}:"), F.col("term")))
             % CMS_W).cast("bigint").alias("bucket"),
        )
        rows = rj if rows is None else rows.unionByName(rj)
    return rows.groupBy("row_idx", "bucket").agg(
        F.count("*").cast("bigint").alias("cnt")
    )


def countmin_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return countmin_counts_frame(docs)


_TOK = SQL_TOKENS.format(expr="text")
_TRI = SQL_TRIGRAMS.format(tok="tok")

HLL_SQL = f"""
WITH t AS (SELECT {_TOK} AS tok FROM documents),
s AS (SELECT unnest({_TRI}) AS sh FROM t),
h AS (SELECT ('0x' || substr(md5(sh), 1, 15))::BIGINT AS hv FROM s),
r AS (
  SELECT (hv % {HLL_M})::BIGINT AS bucket,
         CASE WHEN hv // {HLL_M} = 0 THEN 53
              ELSE 53 - length(bin(hv // {HLL_M})) END::BIGINT AS rank
  FROM h
)
SELECT bucket, max(rank)::BIGINT AS max_rank FROM r GROUP BY bucket
"""

_CMS_ROW = (
    "SELECT {j}::BIGINT AS row_idx, "
    "((('0x' || substr(md5('cms{j}:' || term), 1, 15))::BIGINT) "
    f"% {CMS_W})::BIGINT AS bucket FROM terms"
)

CMS_SQL = (
    f"WITH t AS (SELECT {_TOK} AS tok FROM documents),\n"
    "terms AS (SELECT unnest(tok) AS term FROM t),\n"
    "rows_ AS (" + " UNION ALL ".join(
        _CMS_ROW.format(j=j) for j in range(CMS_D)
    ) + ")\n"
    "SELECT row_idx, bucket, count(*)::BIGINT AS cnt "
    "FROM rows_ GROUP BY row_idx, bucket"
)


QUERIES: dict[str, tuple] = {
    "sketch_hll_registers": (hll_registers, HLL_SQL),
    "sketch_countmin_counts": (countmin_counts, CMS_SQL),
}
