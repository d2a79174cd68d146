"""Canonical-link clustering — ``<link rel="canonical">`` dedup, the
first URL-level dedup every crawl pipeline applies (Common Crawl's
CDX marks revisits; Google's canonicalization collapses print/mobile/
tracking variants BEFORE any content hashing is spent on them).

Semantics (frozen): pull the first ``rel="canonical"`` href from the
page head (both attribute orders are matched by one regex); pages
without a declaration are their own canonical.  Group pages by
canonical target and emit one row per target with:

* ``n_pages``    — cluster size;
* ``n_declared`` — how many members pointed at the target via an
  explicit tag (0 for pure self-canonical singletons);
* ``keep_url``   — the lexicographic min member, the deterministic
  survivor every dedup stage in this repo uses.

The driver corpus has no html column, so the registered query plants
declarations in-engine: an even hash roll points the page at a shared
``/c/{doc_id div 4}`` target (building multi-page clusters), the odd
roll leaves the page undeclared — both cluster shapes and the
``n_declared`` arithmetic are exercised.

Plan shape (the scale story): regex pull is codegen in the scan task;
the groupBy(canonical) is the operator's ONE exchange, carrying only
(canonical, url, declared_flag) short rows — the html/text columns
are pruned before the shuffle (plan-asserted).  Cluster keys are
``div 4`` ranges so no key exceeds a handful of members: skew-free by
construction, and at 10^12 pages the shuffle is the same 3-column
stream. Survivor selection is min(), which Spark executes as a
map-side partial aggregate — no collect_list buffering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

CANON_RE = r'(?i)<link[^>]*rel="canonical"[^>]*href="([^"]+)"'


def _h(doc_id: Column, salt: str) -> Column:
    return portable_hash60(
        F.concat(doc_id.cast("string"), F.lit(":" + salt))
    )


def synth_canonical_pages(docs: DataFrame) -> DataFrame:
    doc_id = F.col("doc_id")
    target = F.concat(
        F.lit("https://canon.test/c/"),
        F.expr("doc_id div 4").cast("string"),
    )
    head = F.when(
        _h(doc_id, "canon") % 2 == 0,
        F.concat(F.lit('<link rel="canonical" href="'), target,
                 F.lit('">')),
    ).otherwise(F.lit(""))
    page = F.concat(
        F.lit("<html><head>"), head,
        F.lit("</head><body><p>"), F.col("text"),
        F.lit("</p></body></html>"),
    )
    return docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".test/"),
                 doc_id.cast("string")).alias("url"),
        page.alias("page"),
    )


def canonical_clusters_frame(pages: DataFrame) -> DataFrame:
    """url, page -> one row per canonical target (cluster accounting)."""
    declared = F.regexp_extract("page", CANON_RE, 1)
    tagged = pages.select(
        "url",
        F.when(declared != "", declared).otherwise(F.col("url"))
        .alias("canonical"),
        F.when(declared != "", F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("is_declared"),
    )
    return tagged.groupBy("canonical").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.sum("is_declared").cast("long").alias("n_declared"),
        F.min("url").alias("keep_url"),
    )


def canonical_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return canonical_clusters_frame(synth_canonical_pages(docs))


_ROLL = sql_hash60("doc_id || ':canon'")

CANONICAL_CLUSTERS_SQL = f"""
WITH pages AS (
  SELECT 'https://' || source || '.test/' || doc_id AS url,
    CASE WHEN {_ROLL} % 2 = 0
         THEN '<link rel="canonical" href="https://canon.test/c/'
              || (doc_id // 4) || '">'
         ELSE '' END AS head
  FROM documents
),
tagged AS (
  SELECT url,
         regexp_extract('<html><head>' || head || '</head>',
             '(?i)<link[^>]*rel="canonical"[^>]*href="([^"]+)"', 1)
           AS declared
  FROM pages
),
resolved AS (
  SELECT url,
         CASE WHEN declared <> '' THEN declared ELSE url END AS canonical,
         CASE WHEN declared <> '' THEN 1 ELSE 0 END AS is_declared
  FROM tagged
)
SELECT canonical,
       count(*)::BIGINT AS n_pages,
       sum(is_declared)::BIGINT AS n_declared,
       min(url) AS keep_url
FROM resolved
GROUP BY canonical
"""


QUERIES: dict[str, tuple] = {
    "web_canonical_clusters": (canonical_clusters, CANONICAL_CLUSTERS_SQL),
}
