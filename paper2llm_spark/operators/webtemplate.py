"""Site-template line detection — the host-level counterpart of C4's
corpus-wide line dedup: lines that repeat across MANY PAGES OF THE
SAME HOST are template chrome (nav bars, footers, cookie banners)
emitted by the site's renderer, and production cleaners (the onion
corpus tool, trafilatura's duplicate-element cache, Dolma's per-host
taggers) strip them per host rather than per corpus so that a
sentence popular across the whole web ("All rights reserved") is
judged against its OWN site's base rate.

Semantics (frozen): a line is a template line of host H when it
appears on >= 2 pages of H AND on at least half of H's pages
(``2 * n_pages >= host_pages`` — exact integer arithmetic, no float
ratio).  A line counts once per page (within-page repeats collapse
via array_distinct first; the within-page problem is
operators/weblinededup.py's job).  Emit one row per (host, template
line) with both counts.

The driver corpus is single-line prose with no host column, so the
registered query plants structure in-engine: each doc maps to host
``{source}-{doc_id % 4}.test`` (20 hosts, ~25 pages each at
sf0.001), every page gets a NAV line (always template), an even
hash roll adds a PROMO line (~50% of pages — exercises the
threshold boundary in both directions per host), and the doc's own
text stays as the unique body line (never template).

Plan shape (the scale story): array_distinct + explode happen in the
scan task; the ONE wide exchange carries (host, line) short rows —
``text`` itself never shuffles because each line row is a fragment.
``host_pages`` is a second tiny aggregate ((host, count) rows,
bounded by the number of hosts ~10^7 at web scale, KB-scale here)
that re-enters via broadcast, so the join adds no exchange.  At
10^12 pages the same plan holds with one refinement documented here:
group on (host, xxhash64(line)) and carry min(line) as the sample so
shuffle rows are fixed-width; the fixture keeps the raw line because
the dual must rebuild identical bytes.  Skew: a mega-host's lines
still spread across partitions because the grouping key is
(host, line), not host alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60


def _h(doc_id: Column, salt: str) -> Column:
    return portable_hash60(
        F.concat(doc_id.cast("string"), F.lit(":" + salt))
    )


def synth_host_pages(docs: DataFrame) -> DataFrame:
    host = F.concat(
        F.col("source"), F.lit("-"),
        (F.col("doc_id") % 4).cast("string"), F.lit(".test"),
    )
    nav = F.concat(F.lit("NAV home about contact "), host)
    promo = F.lit("PROMO subscribe to the site digest")
    body = F.concat(
        nav, F.lit("\n"),
        F.when(_h(F.col("doc_id"), "tmpl") % 2 == 0,
               F.concat(promo, F.lit("\n"))).otherwise(F.lit("")),
        F.col("text"),
    )
    return docs.select(
        host.alias("host"),
        F.concat(host, F.lit("/"), F.col("doc_id").cast("string"))
        .alias("url"),
        body.alias("text"),
    )


def template_lines_frame(pages: DataFrame) -> DataFrame:
    """host, url, text -> (host, line, n_pages, host_pages) template rows."""
    lines = F.array_distinct(F.split(F.col("text"), "\n", -1))
    per_line = (
        pages.select("host", F.explode(lines).alias("line"))
        .where(F.col("line") != "")
    )
    line_counts = per_line.groupBy("host", "line").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages")
    )
    host_pages = pages.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("host_pages")
    )
    return (
        line_counts.join(F.broadcast(host_pages), "host")
        .where((F.col("n_pages") >= 2)
               & (2 * F.col("n_pages") >= F.col("host_pages")))
        .select("host", "line", "n_pages", "host_pages")
    )


def template_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return template_lines_frame(synth_host_pages(docs))


_ROLL = sql_hash60("doc_id || ':tmpl'")

TEMPLATE_LINES_SQL = f"""
WITH pages AS (
  SELECT source || '-' || (doc_id % 4) || '.test' AS host,
    'NAV home about contact ' || source || '-' || (doc_id % 4) || '.test'
      || chr(10)
      || CASE WHEN {_ROLL} % 2 = 0
              THEN 'PROMO subscribe to the site digest' || chr(10)
              ELSE '' END
      || text AS body
  FROM documents
),
per_line AS (
  SELECT host, line
  FROM pages, unnest(list_distinct(string_split(body, chr(10)))) AS u(line)
  WHERE line <> ''
),
line_counts AS (
  SELECT host, line, count(*)::BIGINT AS n_pages
  FROM per_line GROUP BY host, line
),
host_pages AS (
  SELECT host, count(*)::BIGINT AS host_pages FROM pages GROUP BY host
)
SELECT c.host, c.line, c.n_pages, h.host_pages
FROM line_counts c JOIN host_pages h ON c.host = h.host
WHERE c.n_pages >= 2 AND 2 * c.n_pages >= h.host_pages
"""


QUERIES: dict[str, tuple] = {
    "web_template_lines": (template_lines, TEMPLATE_LINES_SQL),
}
