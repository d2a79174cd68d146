"""Sitemap ingestion — the crawler's push-channel URL discovery
(sitemaps.org protocol, consumed by every production crawler next to
robots.txt, which ``webrobots.py`` already covers): parse sitemap XML
documents into candidate-URL rows with the spec's per-entry fields
(``<loc>``, optional ``<lastmod>``, optional ``<priority>`` with the
spec's 0.5 default) and enforce the protocol's same-host rule — a
sitemap may only list URLs on the host that serves it; cross-host
entries are surfaced with ``same_host = false`` so the frontier can
drop them (the spec's "cross submits" are only valid with extra
verification).

Sitemap files are synthesized deterministically from ``documents``
(two same-host entries per file — one fully attributed, one minimal —
plus a cross-host entry on every 4th file), identical in both
engines, so the gate checks block splitting, field extraction,
defaulting, and the host rule end to end.

Plan shape (the scale story): block split is one
``regexp_extract_all`` + ``explode`` in the scan task; field pulls
are codegen ``regexp_extract`` projections — zero exchanges, joins,
Python (plan-asserted).  A 50 k-URL sitemap file costs its own scan
task only; ``text`` is never read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BLOCK = "<url>(.*?)</url>"
_LOC = "<loc>([^<]*)</loc>"
_LASTMOD = "<lastmod>([^<]*)</lastmod>"
_PRIORITY = "<priority>([^<]*)</priority>"
DEFAULT_PRIORITY_MILLI = 500  # spec: priority defaults to 0.5


def _synth_sitemaps(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    xml = F.concat(
        F.lit('<?xml version="1.0"?><urlset>'),
        F.lit("<url><loc>https://"), F.col("source"), F.lit(".test/p/"),
        d, F.lit("-1</loc><lastmod>2026-0"), d % 9 + 1, F.lit("-1"),
        d % 9, F.lit("</lastmod><priority>0."), d % 10,
        F.lit("</priority></url>"),
        F.lit("<url><loc>https://"), F.col("source"), F.lit(".test/p/"),
        d, F.lit("-2</loc></url>"),
        F.when(
            d % 4 == 0,
            F.concat(F.lit("<url><loc>https://evil.example/x/"), d,
                     F.lit("</loc></url>")),
        ).otherwise(F.lit("")),
        F.lit("</urlset>"),
    )
    return docs.select(
        "doc_id",
        F.concat(F.col("source"), F.lit(".test")).alias("host"),
        xml.alias("sitemap_xml"),
    )


def sitemap_urls_frame(sitemaps: DataFrame) -> DataFrame:
    b = sitemaps.select(
        "doc_id", "host",
        F.explode(
            F.regexp_extract_all(
                F.col("sitemap_xml"), F.lit(_BLOCK), F.lit(1)
            )
        ).alias("entry"),
    )
    p = b.select(
        "doc_id", "host",
        F.regexp_extract("entry", _LOC, 1).alias("loc"),
        F.regexp_extract("entry", _LASTMOD, 1).alias("lastmod_raw"),
        F.regexp_extract("entry", _PRIORITY, 1).alias("pr"),
    )
    priority = F.when(
        F.col("pr") == "", F.lit(DEFAULT_PRIORITY_MILLI).cast("bigint")
    ).otherwise(
        F.replace(F.col("pr"), F.lit("0."), F.lit("")).cast("bigint") * 100
    )
    return p.select(
        "doc_id", "host",
        F.col("loc").alias("url"),
        F.when(F.col("lastmod_raw") != "", F.col("lastmod_raw"))
        .alias("lastmod"),
        priority.alias("priority_milli"),
        F.col("loc").startswith(
            F.concat(F.lit("https://"), F.col("host"), F.lit("/"))
        ).alias("same_host"),
    )


def sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return sitemap_urls_frame(_synth_sitemaps(docs))


def _sitemap_sql() -> str:
    return f"""
WITH x AS (
  SELECT doc_id, source || '.test' AS host,
    '<?xml version="1.0"?><urlset>'
    || '<url><loc>https://' || source || '.test/p/' || doc_id || '-1</loc>'
    || '<lastmod>2026-0' || (doc_id % 9 + 1) || '-1' || (doc_id % 9)
    || '</lastmod>'
    || '<priority>0.' || (doc_id % 10) || '</priority></url>'
    || '<url><loc>https://' || source || '.test/p/' || doc_id
    || '-2</loc></url>'
    || CASE WHEN doc_id % 4 = 0
         THEN '<url><loc>https://evil.example/x/' || doc_id
              || '</loc></url>'
         ELSE '' END
    || '</urlset>' AS sitemap_xml
  FROM documents
),
b AS (
  SELECT doc_id, host,
         unnest(regexp_extract_all(sitemap_xml, '{_BLOCK}', 1)) AS entry
  FROM x
),
p AS (
  SELECT doc_id, host,
    regexp_extract(entry, '{_LOC}', 1) AS loc,
    regexp_extract(entry, '{_LASTMOD}', 1) AS lastmod_raw,
    regexp_extract(entry, '{_PRIORITY}', 1) AS pr
  FROM b
)
SELECT doc_id, host, loc AS url,
  CASE WHEN lastmod_raw = '' THEN NULL ELSE lastmod_raw END AS lastmod,
  CASE WHEN pr = '' THEN {DEFAULT_PRIORITY_MILLI}
       ELSE replace(pr, '0.', '')::BIGINT * 100 END::BIGINT
    AS priority_milli,
  (loc LIKE 'https://' || host || '/%') AS same_host
FROM p
"""


SITEMAP_SQL = _sitemap_sql()


QUERIES: dict[str, tuple] = {
    "web_sitemap_urls": (sitemap_urls, SITEMAP_SQL),
}
