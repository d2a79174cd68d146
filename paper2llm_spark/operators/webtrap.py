"""URL-template mining / spider-trap detection — the crawl-side
pattern audit every large crawler runs (Heritrix's calendar-trap
heuristics; IRLbot's "spam and infinite loop" budget enforcement,
Lee et al. WWW'08): mask the volatile parts of URL paths (digit runs,
long hex runs — ids, dates, session tokens) into templates, count
URLs per (host, template), and flag templates that (a) contain masked
slots and (b) generate an outsized share of their host's URLs — the
signature of calendar pages, faceted search, and session-id traps
that can eat a crawler's per-host budget.

Trap rule (all exact integers): template contains ``D``/``H`` masks
AND ``n_urls >= TRAP_MIN`` AND ``100·n_urls >= TRAP_SHARE_PCT ·
host_total``.

The URL corpus is synthesized deterministically from ``documents``
(md5-rolled over five real trap shapes: calendar archive, session-id
product page, static page, incremental blog, faceted search) — same
rows in both engines, so the gate checks masking, grouping, and the
flag arithmetic end to end.

Plan shape (the scale story): masking is a codegen regexp projection
in the scan task; the ONLY corpus-sized exchange is the map-side-
combinable ``groupBy(host, template)`` of short template rows (URLs
collapse scan-side); the host-share window then runs on the already
host-clustered template table (|host × template| rows — exchange
reuse, no second corpus pass).  Zero joins, zero Python, ``text``
never read (plan-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TRAP_MIN = 4        # minimum URLs a template must generate
TRAP_SHARE_PCT = 15  # ...and >= this % of its host's URLs

_HEX_RUN = "[0-9a-f]{8,}"
_DIGIT_RUN = "[0-9]+"


def _synth_paths(docs: DataFrame) -> DataFrame:
    """Deterministic URL corpus over five crawl-trap shapes."""
    shape = F.expr(
        "conv(substr(md5(concat('shape-', doc_id)), 1, 15), 16, 10)"
        " % 5"
    ).cast("int")
    path = (
        F.when(shape == 0, F.concat(
            F.lit("/archive/"), (F.lit(2000) + F.col("doc_id") % 26),
            F.lit("/"), F.col("doc_id") % 12, F.lit("/"),
            F.col("doc_id"), F.lit(".html")))
        .when(shape == 1, F.concat(
            F.lit("/products/item-"), F.col("doc_id"),
            F.lit("?session="),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12)))
        .when(shape == 2, F.lit("/about/team.html"))
        .when(shape == 3, F.concat(F.lit("/blog/post-"), F.col("doc_id")))
        .otherwise(F.concat(F.lit("/search?page="),
                            F.col("doc_id") % 100))
    )
    return docs.select(
        F.concat(F.col("source"), F.lit(".test")).alias("host"),
        path.alias("path"),
    )


def url_templates_frame(docs: DataFrame) -> DataFrame:
    t = _synth_paths(docs).select(
        "host",
        F.regexp_replace(
            F.regexp_replace(F.col("path"), _HEX_RUN, "H"),
            _DIGIT_RUN, "D",
        ).alias("url_template"),
    )
    g = t.groupBy("host", "url_template").agg(
        F.count("*").cast("bigint").alias("n_urls")
    )
    host_total = F.sum("n_urls").over(Window.partitionBy("host"))
    g = g.withColumn("host_total", host_total.cast("bigint"))
    masked = F.col("url_template").contains("D") \
        | F.col("url_template").contains("H")
    trap = masked & (F.col("n_urls") >= TRAP_MIN) \
        & (100 * F.col("n_urls") >= TRAP_SHARE_PCT * F.col("host_total"))
    return g.select("host", "url_template", "n_urls", "host_total",
                    trap.alias("trap"))


def url_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return url_templates_frame(docs)


URL_TEMPLATES_SQL = f"""
WITH u AS (
  SELECT doc_id, source || '.test' AS host,
    ((('0x' || substr(md5('shape-' || doc_id), 1, 15))::BIGINT) % 5)::INT
      AS shape
  FROM documents
),
p AS (
  SELECT host,
    CASE shape
      WHEN 0 THEN '/archive/' || (2000 + doc_id % 26) || '/'
                  || (doc_id % 12) || '/' || doc_id || '.html'
      WHEN 1 THEN '/products/item-' || doc_id || '?session='
                  || substr(md5(doc_id::VARCHAR), 1, 12)
      WHEN 2 THEN '/about/team.html'
      WHEN 3 THEN '/blog/post-' || doc_id
      ELSE '/search?page=' || (doc_id % 100)
    END AS path
  FROM u
),
t AS (
  SELECT host,
    regexp_replace(regexp_replace(path, '{_HEX_RUN}', 'H', 'g'),
                   '{_DIGIT_RUN}', 'D', 'g') AS url_template
  FROM p
),
g AS (
  SELECT host, url_template, count(*)::BIGINT AS n_urls
  FROM t GROUP BY 1, 2
),
w AS (
  SELECT host, url_template, n_urls,
         sum(n_urls) OVER (PARTITION BY host)::BIGINT AS host_total
  FROM g
)
SELECT host, url_template, n_urls, host_total,
       (url_template LIKE '%D%' OR url_template LIKE '%H%')
         AND n_urls >= {TRAP_MIN}
         AND 100 * n_urls >= {TRAP_SHARE_PCT} * host_total AS trap
FROM w
"""


QUERIES: dict[str, tuple] = {
    "web_url_templates": (url_templates, URL_TEMPLATES_SQL),
}
