"""DOM depth profile — structural complexity features (the DOM-size/
nesting-depth battery of boilerplate and spam research: Kohlschütter
et al. WSDM 2010 use structural features beside text ones; Ntoulas
et al. 2006 showed machine-generated spam clusters in structural
feature space; render-cost heuristics cap DOM depth — Lighthouse
flags depth > 32).  Deep, machine-nested markup is a strong
generator signature, and unbalanced tags measure parser stress.

Semantics (frozen): over the tag stream (``<div>`` / ``</div>`` /
void tags like ``<br>`` excluded from depth accounting by a frozen
void list): depth after tag i = opens - closes among tags 0..i;
emitted per page — ``max_depth`` (peak nesting), ``final_depth``
(imbalance at EOF: 0 for well-formed markup), ``n_tags`` (total
non-void tags).  Attributes are tolerated inside tags
(``<div class=x>`` counts as an open div).

The corpus has no html column: the registered query synthesizes
nested markup in-engine — depth d = 1 + roll % 6 of nested divs
around the body, a hash-rolled extra UNCLOSED ``<section>`` plants
the imbalance polarity, and a ``<br>`` plants the void exclusion.

Plan shape (the scale story): the tag stream explodes with position
and depth is a per-url running sum — prefix-sum windows sharing ONE
``hashpartitioning(url)`` exchange with the per-url max/last fold
(the distributed-Kadane discipline of webbte.py); tags are short
rows, the page payload never rides the exchange.  At 10^12 pages
the plan is one url-keyed exchange of (url, pos, ±1) rows.  Zero
joins, zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

VOID_TAGS = ("br", "hr", "img", "meta", "link", "input")
_VOID_ALT = "|".join(VOID_TAGS)
_TAG_RX = r"</?[a-zA-Z][a-zA-Z0-9]*[^>]*>"


def _h(doc_id: Column, salt: str) -> Column:
    return portable_hash60(F.concat(doc_id.cast("string"), F.lit(":" + salt)))


def synth_dom_pages(docs: DataFrame) -> DataFrame:
    doc_id = F.col("doc_id")
    # stage the rolls so the repeat() expressions stay readable
    staged = docs.select(
        "doc_id", "text", _h(doc_id, "domd").alias("h"),
        _h(doc_id, "domu").alias("hu"),
    )
    return staged.select(
        F.concat(F.lit("https://dom.test/"), F.col("doc_id")).alias("url"),
        F.encode(
            F.concat(
                F.lit("<html><body>"),
                F.expr("repeat('<div class=l>', cast(h % 6 + 1 as int))"),
                F.when(F.col("hu") % 7 == 0, F.lit("<section>")).otherwise(
                    F.lit("")
                ),
                F.lit("text<br>more"),
                F.expr("repeat('</div>', cast(h % 6 + 1 as int))"),
                F.lit("</body></html>"),
            ),
            "utf-8",
        ).alias("html"),
    )


def dom_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return dom_depth_frame(synth_dom_pages(docs))


def dom_depth_frame(pages: DataFrame) -> DataFrame:
    tags = pages.select(
        "url",
        F.posexplode(
            F.expr(
                f"regexp_extract_all(decode(html, 'utf-8'), '{_TAG_RX}', 0)"
            )
        ).alias("pos", "tag"),
    )
    name = F.lower(F.regexp_extract(F.col("tag"), r"</?([a-zA-Z][a-zA-Z0-9]*)", 1))
    delta = (
        F.when(name.isin(*VOID_TAGS), 0)
        .when(F.col("tag").startswith("</"), -1)
        .otherwise(1)
    )
    w = Window.partitionBy("url").orderBy("pos")
    run = tags.select(
        "url", "pos", F.sum(delta).over(w).alias("depth"),
        F.abs(delta).alias("counted"),
    )
    return run.groupBy("url").agg(
        F.max("depth").cast("bigint").alias("max_depth"),
        F.max_by("depth", "pos").cast("bigint").alias("final_depth"),
        F.sum("counted").cast("bigint").alias("n_tags"),
    )


_ROLL_D = sql_hash60("doc_id || ':domd'")
_ROLL_U = sql_hash60("doc_id || ':domu'")

DOM_DEPTH_SQL = f"""
WITH synth AS (
  SELECT 'https://dom.test/' || doc_id AS url,
         '<html><body>' ||
         repeat('<div class=l>', (({_ROLL_D}) % 6 + 1)::INT) ||
         CASE WHEN ({_ROLL_U}) % 7 = 0 THEN '<section>' ELSE '' END ||
         'text<br>more' ||
         repeat('</div>', (({_ROLL_D}) % 6 + 1)::INT) ||
         '</body></html>' AS page
  FROM documents
),
tags AS (
  SELECT url,
         unnest(range(1, len(regexp_extract_all(page, '{_TAG_RX}')) + 1))
           AS pos,
         unnest(regexp_extract_all(page, '{_TAG_RX}')) AS tag
  FROM synth
),
d AS (
  SELECT url, pos,
         CASE WHEN lower(regexp_extract(tag, '</?([a-zA-Z][a-zA-Z0-9]*)', 1))
                   IN ({", ".join(f"'{t}'" for t in VOID_TAGS)}) THEN 0
              WHEN tag LIKE '</%' THEN -1 ELSE 1 END AS delta
  FROM tags
),
run AS (
  SELECT url, pos,
         sum(delta) OVER (PARTITION BY url ORDER BY pos) AS depth,
         abs(delta) AS counted
  FROM d
)
SELECT url,
       max(depth)::BIGINT AS max_depth,
       max_by(depth, pos)::BIGINT AS final_depth,
       sum(counted)::BIGINT AS n_tags
FROM run GROUP BY url
"""


QUERIES: dict[str, tuple] = {
    "web_dom_depth": (dom_depth, DOM_DEPTH_SQL),
}
