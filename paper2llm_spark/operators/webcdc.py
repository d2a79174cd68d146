"""Content-defined chunking — the LBFS rolling-window scheme
(Muthitacharoen et al. SOSP'01, the basis of FastCDC/restic/borg
chunking): cut a document wherever the fingerprint of the trailing
``W``-char window hits a magic residue (``hash % M == 0``), so chunk
boundaries depend only on LOCAL content — insert one paragraph into a
page and every other chunk digest stays identical, which is what
makes chunk-level storage dedup work for dataset versioning (the same
reason Common Crawl re-snapshots dedupe well at the chunk level while
whole-file digests all change).

Exactness: the window fingerprint is ``portable_hash60`` of the
trailing ``W`` characters — one md5 per position, identical in both
engines (an O(n·W) formulation; a production gear-table rolling hash
is O(n) with the SAME plan shape — the boundary rule is the
algorithm, the hash family is a constant).  Expected chunk length is
``M`` chars with no min/max clamp (classic LBFS; FastCDC's
normalization would add a sequential dependency the declarative form
deliberately avoids).

Plan shape (the scale story): boundary positions, the final-bound
append, and per-chunk (start, len, md5) are all bound-array HOF
stages in the scan task plus one explode — ZERO exchanges, joins,
Python (plan-asserted).  A downstream ``groupBy(chunk_md5)`` (the
storage dedup map) is the caller's one short-row exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60

W_CDC = 16   # rolling window, chars
M_CDC = 64   # boundary modulus -> expected chunk length, chars


def cdc_chunks_frame(docs: DataFrame) -> DataFrame:
    w, m = W_CDC, M_CDC
    t = docs.select(
        "doc_id", "text", F.length("text").cast("bigint").alias("n")
    ).filter(F.col("n") >= 1)
    cuts = F.when(
        F.col("n") >= w,
        F.filter(
            F.sequence(F.lit(w), F.col("n").cast("int")),
            lambda i: portable_hash60(
                F.col("text").substr(i - w + 1, F.lit(w))
            ) % m == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    b = t.select("doc_id", "text", "n", cuts.alias("cuts"))
    bounds = F.when(
        (F.size("cuts") > 0)
        & (F.element_at("cuts", -1) == F.col("n").cast("int")),
        F.col("cuts"),
    ).otherwise(F.concat("cuts", F.array(F.col("n").cast("int"))))
    b2 = b.select("doc_id", "text", bounds.alias("bounds"))
    c = b2.select(
        "doc_id", "text", "bounds",
        F.explode(F.sequence(F.lit(1), F.size("bounds"))).alias("j"),
    )
    start = F.when(F.col("j") == 1, F.lit(1)).otherwise(
        F.element_at("bounds", F.col("j") - 1) + 1
    )
    s = c.select(
        "doc_id", "text",
        F.col("j").cast("bigint").alias("chunk_idx"),
        start.alias("start"),
        (F.element_at("bounds", F.col("j")) - start + 1).alias("clen"),
    )
    return s.select(
        "doc_id", "chunk_idx",
        F.col("start").cast("bigint").alias("chunk_start"),
        F.col("clen").cast("bigint").alias("chunk_len"),
        F.md5(F.col("text").substr(F.col("start"), F.col("clen")))
        .alias("chunk_md5"),
    )


def cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return cdc_chunks_frame(docs)


CDC_SQL = f"""
WITH t AS (
  SELECT doc_id, text, length(text)::BIGINT AS n
  FROM documents
),
bp AS (
  SELECT doc_id, text, n,
    CASE WHEN n >= {W_CDC} THEN
      list_filter(range({W_CDC}, n + 1),
        i -> (('0x' || substr(md5(
              substr(text, (i - {W_CDC} + 1)::INT, {W_CDC})), 1, 15))::BIGINT)
             % {M_CDC} = 0)
    ELSE [] END AS cuts
  FROM t WHERE n >= 1
),
b2 AS (
  SELECT doc_id, text, n,
    CASE WHEN len(cuts) > 0 AND cuts[-1] = n THEN cuts
         ELSE list_append(cuts, n) END AS bounds
  FROM bp
),
c AS (
  SELECT doc_id, text, bounds,
         unnest(range(1, len(bounds) + 1)) AS j
  FROM b2
),
s AS (
  SELECT doc_id, text, j::BIGINT AS chunk_idx,
         CASE WHEN j = 1 THEN 1
              ELSE bounds[(j-1)::INT] + 1 END AS start,
         bounds[j::INT]
           - (CASE WHEN j = 1 THEN 1 ELSE bounds[(j-1)::INT] + 1 END) + 1
           AS clen
  FROM c
)
SELECT doc_id, chunk_idx,
       start::BIGINT AS chunk_start,
       clen::BIGINT AS chunk_len,
       md5(substr(text, start::INT, clen::INT)) AS chunk_md5
FROM s
"""


QUERIES: dict[str, tuple] = {
    "dedup_cdc_chunks": (cdc_chunks, CDC_SQL),
}
