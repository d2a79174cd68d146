"""Structured-data extraction — JSON-LD / microdata harvesting, the
Web Data Commons pipeline shape (Bizer et al.; WDC has extracted
schema.org data from every Common Crawl snapshot since 2012).  The
embedded ``<script type="application/ld+json">`` blocks and
``itemtype`` microdata attributes are the web's machine-readable
layer — product/article/recipe corpora, KG population, and typed
training sets all start from this extraction.

Semantics (frozen): per page — ``n_ldjson`` = count of ld+json
script blocks; ``first_type`` = the first ``"@type": "X"`` value in
the payload ('' when absent); ``has_microdata`` = an
``itemtype="https://schema.org/..."`` attribute exists.  Extraction
is regex-subset by design (the webmeta.py honesty contract): quoted
attributes, case-sensitive schema.org spellings, no nested-JSON
parse — the type is pulled lexically, WDC's own fast path; a full
JSON parse is the documented seam for payload-level work.

The driver corpus has no html column, so the registered query
synthesizes page payloads in-engine (the webmeta.py technique):
hash rolls plant zero/one/two ld+json blocks with per-roll @type
(Article/Product/Recipe), flip single vs double quotes on the type
key, and independently plant/omit microdata — every output column
driver-certified in both polarities.

Plan shape (the scale story): synthesis + all three extractions are
ONE codegen projection (regexp_count / regexp_extract) riding the
scan — zero exchanges, zero joins, zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

_TYPES = ("Article", "Product", "Recipe")


def _h(doc_id: Column, salt: str) -> Column:
    return portable_hash60(F.concat(doc_id.cast("string"), F.lit(":" + salt)))


def synth_wdc_pages(docs: DataFrame) -> DataFrame:
    doc_id = F.col("doc_id")
    t = _h(doc_id, "ldt") % 3
    tname = (
        F.when(t == 0, _TYPES[0]).when(t == 1, _TYPES[1]).otherwise(_TYPES[2])
    )
    # quote style flips on an independent roll: "@type" vs '@type'
    key = F.when(_h(doc_id, "ldq") % 2 == 0, F.lit('"@type": "')).otherwise(
        F.lit("'@type': '")
    )
    close = F.when(_h(doc_id, "ldq") % 2 == 0, F.lit('"')).otherwise(
        F.lit("'")
    )
    block = F.concat(
        F.lit('<script type="application/ld+json">{'),
        key, tname, close,
        F.lit("}</script>"),
    )
    n = _h(doc_id, "ldn") % 3  # 0, 1 or 2 blocks
    ld = F.when(n == 0, F.lit("")).when(n == 1, block).otherwise(
        F.concat(block, block)
    )
    micro = F.when(
        _h(doc_id, "md") % 5 == 0,
        F.lit('<div itemscope itemtype="https://schema.org/WebPage">'),
    ).otherwise(F.lit("<div>"))
    return docs.select(
        F.concat(F.lit("https://wdc.test/"), doc_id).alias("url"),
        F.encode(
            F.concat(
                F.lit("<html><head>"), ld, F.lit("</head><body>"),
                micro, F.col("text"), F.lit("</div></body></html>"),
            ),
            "utf-8",
        ).alias("html"),
    )


def structured_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return structured_frame(synth_wdc_pages(docs))


_LD_OPEN = r'<script type="application/ld\+json">'
_TYPE_RX = """["']@type["']:\\s*["']([A-Za-z]+)["']"""
_MICRO_RX = r'itemtype="https://schema\.org/'


def structured_frame(pages: DataFrame) -> DataFrame:
    body = F.decode(F.col("html"), "utf-8")
    return pages.select(
        "url",
        F.regexp_count(body, F.lit(_LD_OPEN)).cast("bigint").alias("n_ldjson"),
        F.regexp_extract(body, _TYPE_RX, 1).alias("first_type"),
        body.rlike(_MICRO_RX).alias("has_microdata"),
    )


_TYPE_RX_SQL = _TYPE_RX.replace("'", "''")  # escape for SQL literal

_ROLL_T = sql_hash60("doc_id || ':ldt'")
_ROLL_Q = sql_hash60("doc_id || ':ldq'")
_ROLL_N = sql_hash60("doc_id || ':ldn'")
_ROLL_M = sql_hash60("doc_id || ':md'")

WDC_SQL = f"""
WITH synth AS (
  SELECT 'https://wdc.test/' || doc_id AS url,
         '<html><head>' ||
         CASE ({_ROLL_N}) % 3 WHEN 0 THEN '' ELSE
           repeat('<script type="application/ld+json">{{' ||
                  CASE WHEN ({_ROLL_Q}) % 2 = 0
                       THEN '"@type": "' ELSE '''@type'': ''' END ||
                  CASE ({_ROLL_T}) % 3 WHEN 0 THEN 'Article'
                       WHEN 1 THEN 'Product' ELSE 'Recipe' END ||
                  CASE WHEN ({_ROLL_Q}) % 2 = 0 THEN '"' ELSE '''' END ||
                  '}}</script>', (({_ROLL_N}) % 3)::INT)
         END ||
         '</head><body>' ||
         CASE WHEN ({_ROLL_M}) % 5 = 0
              THEN '<div itemscope itemtype="https://schema.org/WebPage">'
              ELSE '<div>' END ||
         text || '</div></body></html>' AS page
  FROM documents
)
SELECT url,
       len(regexp_extract_all(page, '{_LD_OPEN}'))::BIGINT AS n_ldjson,
       coalesce(regexp_extract(page, '{_TYPE_RX_SQL}', 1), '') AS first_type,
       regexp_matches(page, '{_MICRO_RX}') AS has_microdata
FROM synth
"""


QUERIES: dict[str, tuple] = {
    "web_structured_data": (structured_data, WDC_SQL),
}
