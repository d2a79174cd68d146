"""Ingest-gate filters (SURVEY.md §2.11) — the two checks a crawl
pipeline runs BEFORE paying for parse/dedup compute:

* **Bloom-filter dedup pre-pass** (the Dolma/CCNet "have we ingested
  this before" gate): membership of every candidate document's content
  digest against a Bloom filter built from the already-ingested corpus.
  The filter is DETERMINISTIC — bit positions come from the portable
  md5-60 hash (``pos_i = hash60(digest || ':' || i) % BLOOM_BITS``) —
  so Spark and DuckDB build bit-identical filters and the gate verifies
  exact membership answers, false positives included.

  Plan shape (the 10^12-doc story): the "seen" side collapses to at
  most ``BLOOM_BITS`` distinct set-bit rows (a map-side-combinable
  distinct — the whole filter is a few KB regardless of how many
  billion keys went in), which **broadcasts**; candidates explode to
  ``BLOOM_K`` probe rows each and broadcast-join the bit set; one
  groupBy(doc_id) on short keys counts probe hits. Nothing corpus-sized
  shuffles, the text column dies at the scan, and a bigger corpus only
  changes the constants (production: 2^33 bits / k=7 for 10^9 keys at
  1% FP; the module constants are fixture-scaled).

* **URL blocklist filter** (the RefinedWeb §3.1 UT1-blocklist stage):
  every page's host is looked up in a category blocklist; blocked pages
  drop before fetch/parse. The blocklist is a tiny dimension table —
  here an md5-seeded literal over the corpus's source names (mirrored
  in the dual), on a cluster the ~4M-entry UT1 list — and rides the
  plan as a **broadcast** hash join against the scan-side host parse:
  zero shuffles of page rows.

Both queries carry DuckDB duals with identical column names/values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

BLOOM_BITS = 1 << 16
BLOOM_K = 3
# "already ingested" reference slice: even doc_ids (half the corpus),
# so the gate sees ~50% true members, ~50% misses, plus whatever false
# positives the (deterministic) filter produces
_SEEN_PRED = "doc_id % 2 = 0"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


def _probe_bits(digest: Column) -> Column:
    """Array of BLOOM_K (probe_idx, bit) structs for one content digest
    — the same positions both the build and probe sides use."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                (
                    portable_hash60(F.concat(digest, F.lit(f":{i}")))
                    % BLOOM_BITS
                ).cast("int").alias("bit"),
            )
            for i in range(BLOOM_K)
        ]
    )


def bloom_prefilter_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, n_hits, maybe_seen) — Bloom membership of every doc's
    md5(text) against the filter built from the even-doc_id slice."""
    digests = docs.select("doc_id", F.md5("text").alias("dg"))
    seen_bits = (
        digests.filter(F.expr(_SEEN_PRED))
        .select(F.explode(_probe_bits(F.col("dg"))).alias("pb"))
        .select(F.col("pb.bit").alias("bit"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    probes = digests.select(
        "doc_id", F.explode(_probe_bits(F.col("dg"))).alias("pb")
    ).select("doc_id", F.col("pb.bit").alias("bit"))
    return (
        probes.join(F.broadcast(seen_bits), "bit", "left")
        .groupBy("doc_id")
        .agg(F.count("hit").alias("n_hits"))
        .select(
            "doc_id",
            "n_hits",
            (F.col("n_hits") == BLOOM_K).alias("maybe_seen"),
        )
    )


def bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bloom_prefilter_frame(_docs(spark, sf_dir))


_BIT_BUILD = "(" + sql_hash60("dg || ':' || i") + f" % {BLOOM_BITS})"

BLOOM_PREFILTER_SQL = f"""
WITH d AS (SELECT doc_id, md5(text) AS dg FROM documents),
bits AS (
  SELECT DISTINCT {_BIT_BUILD} AS bit
  FROM d CROSS JOIN range(0, {BLOOM_K}) t(i)
  WHERE {_SEEN_PRED}
),
probes AS (
  SELECT doc_id, i, {_BIT_BUILD} AS bit
  FROM d CROSS JOIN range(0, {BLOOM_K}) t(i)
),
hits AS (
  SELECT p.doc_id, count(b.bit)::BIGINT AS n_hits
  FROM probes p LEFT JOIN bits b USING (bit)
  GROUP BY p.doc_id
)
SELECT doc_id, n_hits, (n_hits = {BLOOM_K}) AS maybe_seen FROM hits
"""


# ---------------------------------------------------------------------------
# URL blocklist (UT1-style category filter)
# ---------------------------------------------------------------------------

BLOCK_CATEGORIES = ("adult", "malware", "gambling")
# md5-seeded assignment: a source lands on the blocklist iff its 60-bit
# hash is even; its category is hash % |categories| — both engines
# derive the same table from the same seeds, no literal list to drift
_BLOCK_SEED = "blocklist-v1:"


def blocklist_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, host, blocked, category) — host parsed scan-side from
    the synthesized page URL; category via the broadcast blocklist."""
    pages = docs.select(
        "doc_id",
        F.concat(F.col("source"), F.lit(".test")).alias("host"),
    )
    sources = docs.select("source").distinct()
    h = portable_hash60(F.concat(F.lit(_BLOCK_SEED), F.col("source")))
    blocklist = sources.select(
        F.concat(F.col("source"), F.lit(".test")).alias("host"),
        F.element_at(
            F.array(*[F.lit(c) for c in BLOCK_CATEGORIES]),
            (h % len(BLOCK_CATEGORIES)).cast("int") + 1,
        ).alias("category"),
    ).filter((h % 2) == 0)
    return (
        pages.join(F.broadcast(blocklist), "host", "left")
        .select(
            "doc_id",
            "host",
            F.col("category").isNotNull().alias("blocked"),
            "category",
        )
    )


def url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return blocklist_frame(_docs(spark, sf_dir))


_SRC_H = sql_hash60(f"'{_BLOCK_SEED}' || source")
_CATS = "[" + ", ".join(f"'{c}'" for c in BLOCK_CATEGORIES) + "]"

URL_BLOCKLIST_SQL = f"""
WITH b AS (
  SELECT source || '.test' AS host,
         ({_CATS})[({_SRC_H} % {len(BLOCK_CATEGORIES)})::INT + 1] AS category
  FROM (SELECT DISTINCT source FROM documents)
  WHERE {_SRC_H} % 2 = 0
)
SELECT d.doc_id,
       d.source || '.test' AS host,
       (b.category IS NOT NULL) AS blocked,
       b.category
FROM documents d LEFT JOIN b ON d.source || '.test' = b.host
"""


QUERIES: dict[str, tuple] = {
    "dedup_bloom_prefilter": (bloom_prefilter, BLOOM_PREFILTER_SQL),
    "corpus_url_blocklist": (url_blocklist, URL_BLOCKLIST_SQL),
}
