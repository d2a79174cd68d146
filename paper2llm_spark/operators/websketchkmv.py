"""KMV / theta-sketch set overlap (Bar-Yossef et al. 2002; Beyer et
al. SIGMOD 2007 "On synopses for distinct-value estimation"; the
Apache DataSketches theta sketch) — the sketch family that, unlike
HLL (websketch.py), supports set INTERSECTION: keep the K smallest
hash values per set; below the pairwise threshold θ = min of the two
kth values, both sketches are exact samples of the hash space, so
membership counts below θ estimate Jaccard and intersection sizes.
The curation question: how much VOCABULARY do two crawl sources
share — without ever comparing the sources row-by-row.

Semantics (frozen): per-source sets are the DISTINCT lowercased
token vocabularies; 60-bit md5 hashes; K = 32 smallest per source;
per source pair (a < b): ``theta`` = least of the two kth (max-of-
sketch) values, ``n_union`` / ``n_inter`` = distinct hash values
below θ in either / both sketches, ``jaccard_micro = 1e6 · n_inter
div n_union`` (the sketch Jaccard — exact integers end to end; the
distinct-count estimators (K-1)·2^60/kth overflow int64 and live
driver-side, the HLL/CMS split).  The fixture's sources share one
closed vocabulary (Jaccard would be a constant 1), so the registered
query plants 8 source-exclusive tokens per source in-engine —
overlap lands strictly between 0 and 1 and the gate certifies the
set algebra, not a constant.

Plan shape (the scale story): token explode → distinct(source, word)
is the ONE corpus-sized exchange (map-side combinable); the per-
source K-smallest window runs over the collapsed vocabulary; all
pair algebra operates on K·|sources| rows — broadcast-sized by
construction regardless of corpus size.  Zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, sql_hash60, tokens

KMV_K = 32


def kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    planted = docs.select(
        "source",
        F.concat(
            F.col("text"), F.lit(" xs-"), F.col("source"), F.lit("-"),
            F.col("doc_id") % 8,
        ).alias("text"),
    )
    return kmv_frame(planted)


def kmv_frame(docs: DataFrame) -> DataFrame:
    vocab = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("w"))
        .distinct()
        .select(
            "source",
            F.conv(F.substring(F.md5("w"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("h"),
        )
    )
    rn = F.row_number().over(Window.partitionBy("source").orderBy("h"))
    sketch = (
        vocab.select("source", "h", rn.alias("rn"))
        .filter(F.col("rn") <= KMV_K)
        .localCheckpoint()
    )
    kth = sketch.groupBy("source").agg(F.max("h").alias("kth"))
    pairs = (
        kth.alias("a")
        .join(kth.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
            F.least(F.col("a.kth"), F.col("b.kth")).alias("theta"),
        )
    )
    av = pairs.join(
        sketch.withColumnRenamed("source", "src_a"), "src_a"
    ).filter(F.col("h") < F.col("theta")).select("src_a", "src_b", "theta", "h")
    bv = pairs.join(
        sketch.withColumnRenamed("source", "src_b"), "src_b"
    ).filter(F.col("h") < F.col("theta")).select("src_a", "src_b", "theta", "h")
    uni = (
        av.unionByName(bv)
        .distinct()
        .groupBy("src_a", "src_b", "theta")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_union"))
    )
    inter = (
        av.join(bv, ["src_a", "src_b", "theta", "h"])
        .groupBy("src_a", "src_b", "theta")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    return (
        uni.join(inter, ["src_a", "src_b", "theta"], "left")
        .select(
            "src_a", "src_b", "theta", "n_union",
            F.coalesce(F.col("n_inter"), F.lit(0))
            .cast("bigint")
            .alias("n_inter"),
        )
        .select(
            "src_a", "src_b", "theta", "n_union", "n_inter",
            F.expr("1000000 * n_inter div n_union").alias("jaccard_micro"),
        )
    )


_TOK = SQL_TOKENS.format(expr="text")
_H = sql_hash60("w")

KMV_SQL = f"""
WITH planted AS (
  SELECT source, text || ' xs-' || source || '-' || (doc_id % 8) AS text
  FROM documents
),
vocab AS (
  SELECT DISTINCT source, w
  FROM (SELECT source, {_TOK} AS tok FROM planted), unnest(tok) AS u(w)
),
hashes AS (SELECT source, {_H} AS h FROM vocab),
ranked AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM hashes
),
sketch AS (SELECT source, h FROM ranked WHERE rn <= {KMV_K}),
kth AS (SELECT source, max(h) AS kth FROM sketch GROUP BY 1),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         least(a.kth, b.kth) AS theta
  FROM kth a JOIN kth b ON a.source < b.source
),
av AS (SELECT p.src_a, p.src_b, p.theta, s.h
       FROM pairs p JOIN sketch s ON s.source = p.src_a AND s.h < p.theta),
bv AS (SELECT p.src_a, p.src_b, p.theta, s.h
       FROM pairs p JOIN sketch s ON s.source = p.src_b AND s.h < p.theta),
uni AS (
  SELECT src_a, src_b, theta, count(*)::BIGINT AS n_union
  FROM (SELECT DISTINCT * FROM (SELECT * FROM av UNION ALL SELECT * FROM bv))
  GROUP BY 1, 2, 3
),
inter AS (
  SELECT av.src_a, av.src_b, av.theta, count(*)::BIGINT AS n_inter
  FROM av JOIN bv ON av.src_a = bv.src_a AND av.src_b = bv.src_b
                  AND av.theta = bv.theta AND av.h = bv.h
  GROUP BY 1, 2, 3
)
SELECT uni.src_a, uni.src_b, uni.theta, uni.n_union,
       coalesce(inter.n_inter, 0)::BIGINT AS n_inter,
       1000000 * coalesce(inter.n_inter, 0) // uni.n_union AS jaccard_micro
FROM uni LEFT JOIN inter ON inter.src_a = uni.src_a
                        AND inter.src_b = uni.src_b
                        AND inter.theta = uni.theta
"""


QUERIES: dict[str, tuple] = {
    "sketch_kmv_overlap": (kmv_overlap, KMV_SQL),
}
