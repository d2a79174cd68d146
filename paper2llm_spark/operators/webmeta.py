"""HTML metadata extraction — the per-page header signals every
crawl pipeline records next to the extracted text (trafilatura /
dragnet-style metadata: ``<title>``, OpenGraph title, meta
description, canonical URL, robots directives) plus the downstream
``indexable`` gate (pages marked ``noindex`` are excluded from
training corpora for compliance).

Plan shape: ONE codegen projection in the scan task — every field is
a ``regexp_extract`` over the decoded payload, zero joins, zero
exchanges beyond the single-file spread; at 10^12 pages this is
embarrassingly parallel.  No Python anywhere.

Extractor generality (honest scope): patterns are case-insensitive,
accept single- OR double-quoted attribute values, tolerate attributes
before the one matched, and handle BOTH attribute orders
(``name=… content=…`` and ``content=… name=…``) via a
first-nonempty coalesce of two patterns — the corpus exercises both
orders.  NOT handled (documented, rare in practice): unquoted
attribute values and ``>`` inside quoted values; a real deployment
swaps in the lxml seam used by ``html_extract`` when that matters.

The driver corpus has no html column, so the registered query
synthesizes page payloads in-engine (the ``web_outlink_hostgraph``
technique): a ``<head>`` whose fields are deterministically present /
absent / order-flipped per 60-bit hash rolls, so every output column
is verified in both polarities — present values must round-trip
byte-identically, absent ones must come back as ''.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60, tokens

DESC_TOKENS = 8  # meta-description length in tokens


def _h(doc_id: Column, salt: str) -> Column:
    return portable_hash60(
        F.concat(doc_id.cast("string"), F.lit(":" + salt))
    )


def synth_meta_pages(docs: DataFrame) -> DataFrame:
    """documents -> (url, html:binary) pages with deterministic head
    metadata; byte-identical in the DuckDB dual."""
    doc_id = F.col("doc_id")
    title = F.concat(F.lit("Document "), doc_id.cast("string"))
    desc = F.array_join(F.slice(tokens(F.col("text")), 1, DESC_TOKENS), " ")

    og = F.when(
        _h(doc_id, "og") % 3 != 0,
        F.concat(F.lit('<meta property="og:title" content="'), title,
                 F.lit(' | OG">')),
    ).otherwise(F.lit(""))
    # attribute order flips on h%2 so both extractor patterns are hit
    desc_tag = F.when(
        _h(doc_id, "desc") % 4 == 0, F.lit("")
    ).when(
        _h(doc_id, "desc") % 2 == 0,
        F.concat(F.lit('<meta content="'), desc,
                 F.lit('" name="description">')),
    ).otherwise(
        F.concat(F.lit('<meta name="description" content="'), desc,
                 F.lit('">')),
    )
    canonical = F.when(
        _h(doc_id, "canon") % 5 != 0,
        F.concat(F.lit('<link rel="canonical" href="https://'),
                 F.col("source"), F.lit(".test/c/"),
                 doc_id.cast("string"), F.lit('">')),
    ).otherwise(F.lit(""))
    robots = F.when(
        _h(doc_id, "robots") % 6 == 0,
        F.lit('<meta name="robots" content="noindex, nofollow">'),
    ).when(
        _h(doc_id, "robots") % 2 == 0,
        F.lit('<meta name="robots" content="index, follow">'),
    ).otherwise(F.lit(""))

    return docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".test/"),
                 doc_id.cast("string")).alias("url"),
        F.encode(
            F.concat(
                F.lit("<html><head><title>"), title, F.lit("</title>"),
                og, desc_tag, canonical, robots,
                F.lit("</head><body><p>"), F.col("text"),
                F.lit("</p></body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
    )


# either-quote, attr-prefix-tolerant patterns; {a}/{v} are the anchor
# attribute and the value-carrying attribute
_NAME_FIRST = r'(?i)<{tag}\b[^>]*{a}\s*=\s*["\']{key}["\'][^>]*{v}\s*=\s*["\']([^"\']*)'
_VALUE_FIRST = r'(?i)<{tag}\b[^>]*{v}\s*=\s*["\']([^"\']*)["\'][^>]*{a}\s*=\s*["\']{key}["\']'


def _field(page: Column, tag: str, a: str, key: str, v: str) -> Column:
    """First-nonempty of the two attribute orders."""
    p1 = F.regexp_extract(
        page, _NAME_FIRST.format(tag=tag, a=a, key=key, v=v), 1
    )
    p2 = F.regexp_extract(
        page, _VALUE_FIRST.format(tag=tag, a=a, key=key, v=v), 1
    )
    return F.when(p1 != "", p1).otherwise(p2)


def meta_extract_frame(pages: DataFrame) -> DataFrame:
    """(url, html:binary) -> per-page metadata row."""
    staged = pages.select(
        "url", F.decode(F.col("html"), "UTF-8").alias("page")
    )
    page = F.col("page")
    robots = _field(page, "meta", "name", "robots", "content")
    return staged.select(
        "url",
        F.regexp_extract(page, r"(?i)<title>([^<]*)</title>", 1)
        .alias("title"),
        _field(page, "meta", "property", "og:title", "content")
        .alias("og_title"),
        _field(page, "meta", "name", "description", "content")
        .alias("description"),
        _field(page, "link", "rel", "canonical", "href").alias("canonical"),
        robots.alias("robots"),
        (~F.lower(robots).contains("noindex")).alias("indexable"),
    )


def meta_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return meta_extract_frame(synth_meta_pages(docs))


_TOK = "list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0)"


def _sqlh(salt: str) -> str:
    return sql_hash60(f"doc_id || ':{salt}'")


# DuckDB twins of the two attribute-order patterns ('' -> '''' inside a
# SQL literal)
def _sql_field(tag: str, a: str, key: str, v: str) -> str:
    p1 = (
        f"(?i)<{tag}\\b[^>]*{a}\\s*=\\s*[\"'']{key}[\"''][^>]*"
        f"{v}\\s*=\\s*[\"'']([^\"'']*)"
    )
    p2 = (
        f"(?i)<{tag}\\b[^>]*{v}\\s*=\\s*[\"'']([^\"'']*)[\"''][^>]*"
        f"{a}\\s*=\\s*[\"'']{key}[\"'']"
    )
    return (
        f"CASE WHEN regexp_extract(page, '{p1}', 1) <> ''"
        f" THEN regexp_extract(page, '{p1}', 1)"
        f" ELSE regexp_extract(page, '{p2}', 1) END"
    )


_ROBOTS = _sql_field("meta", "name", "robots", "content")

META_EXTRACT_SQL = f"""
WITH d AS (
  SELECT doc_id, source, text,
         'Document ' || doc_id AS title,
         coalesce(array_to_string(({_TOK})[1:{DESC_TOKENS}], ' '), '') AS descr
  FROM documents
),
p AS (
  SELECT 'https://' || source || '.test/' || doc_id AS url,
         '<html><head><title>' || title || '</title>'
         || CASE WHEN {_sqlh("og")} % 3 <> 0
                 THEN '<meta property="og:title" content="' || title
                      || ' | OG">'
                 ELSE '' END
         || CASE WHEN {_sqlh("desc")} % 4 = 0 THEN ''
                 WHEN {_sqlh("desc")} % 2 = 0
                 THEN '<meta content="' || descr || '" name="description">'
                 ELSE '<meta name="description" content="' || descr || '">'
            END
         || CASE WHEN {_sqlh("canon")} % 5 <> 0
                 THEN '<link rel="canonical" href="https://' || source
                      || '.test/c/' || doc_id || '">'
                 ELSE '' END
         || CASE WHEN {_sqlh("robots")} % 6 = 0
                 THEN '<meta name="robots" content="noindex, nofollow">'
                 WHEN {_sqlh("robots")} % 2 = 0
                 THEN '<meta name="robots" content="index, follow">'
                 ELSE '' END
         || '</head><body><p>' || text || '</p></body></html>' AS page
  FROM d
)
SELECT url,
       regexp_extract(page, '(?i)<title>([^<]*)</title>', 1) AS title,
       {_sql_field("meta", "property", "og:title", "content")} AS og_title,
       {_sql_field("meta", "name", "description", "content")} AS description,
       {_sql_field("link", "rel", "canonical", "href")} AS canonical,
       {_ROBOTS} AS robots,
       NOT contains(lower({_ROBOTS}), 'noindex') AS indexable
FROM p
"""


QUERIES: dict[str, tuple] = {
    "web_meta_extract": (meta_extract, META_EXTRACT_SQL),
}
