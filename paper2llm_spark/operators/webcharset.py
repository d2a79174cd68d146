"""Charset sniffing — the HTML5 §13.2.3 encoding prescan every crawl
ingest runs before main-content extraction (warcio / trafilatura /
jusText all detect the payload encoding first; Common Crawl WARC
payloads declare charsets that lie often enough that the sniff order
is specified normatively).

Frozen deterministic subset of the spec's precedence:

1. **BOM** — a payload starting with the UTF-8 byte-order mark
   (``EF BB BF``, i.e. U+FEFF after decode) is ``utf-8-bom``;
2. **meta declaration** — the first ``<meta ... charset=X`` pull
   (codegen regex covering BOTH spec forms: the HTML5
   ``<meta charset="X">`` attribute and the legacy
   ``<meta http-equiv="Content-Type" content="...; charset=X">``),
   lowercased;
3. **high-byte heuristic** — undeclared payloads whose byte length
   exceeds their decoded char length contain multibyte sequences:
   ``utf-8``; otherwise ``ascii``.

Byte-vs-char arithmetic is engine-portable by construction:
Spark ``length(binary)`` counts bytes and ``length(string)`` counts
chars; DuckDB ``strlen`` counts the UTF-8 bytes of a varchar and
``length`` its chars — so ``n_bytes > n_chars`` is the identical
multibyte predicate in both engines.

Plan shape (the scale story): the whole operator is ONE codegen
projection in the scan task — zero exchanges, zero joins, zero Python
(plan-asserted); at 10^12 pages this adds nothing to the extract
pipeline's scan cost.

The driver corpus has no html column, so the registered query
synthesizes payloads in-engine: a 4-way hash roll plants the BOM, the
HTML5 meta form (windows-1252), the legacy http-equiv form
(iso-8859-1) and the undeclared case, and an independent roll mixes a
multibyte character (U+00E9) into half the bodies — every precedence
branch and both heuristic outcomes are exercised.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

_META_RE = (
    r"(?i)<meta[^>]*charset\s*=\s*[\"']?([a-z0-9_\-]+)"
)

_BOM = "﻿"
_E_ACUTE = "é"


def _h(doc_id: Column, salt: str) -> Column:
    return portable_hash60(
        F.concat(doc_id.cast("string"), F.lit(":" + salt))
    )


def synth_charset_pages(docs: DataFrame) -> DataFrame:
    doc_id = F.col("doc_id")
    head = (
        F.when(_h(doc_id, "enc") % 4 == 0, F.lit(_BOM))
        .when(_h(doc_id, "enc") % 4 == 1,
              F.lit('<meta charset="windows-1252">'))
        .when(
            _h(doc_id, "enc") % 4 == 2,
            F.lit('<meta http-equiv="Content-Type" '
                  'content="text/html; charset=iso-8859-1">'),
        )
        .otherwise(F.lit(""))
    )
    body = F.concat(
        F.lit("caf"),
        F.when(_h(doc_id, "hb") % 2 == 0, F.lit(_E_ACUTE))
        .otherwise(F.lit("e")),
        F.lit(" menu for item "), doc_id.cast("string"),
    )
    page = F.concat(
        head, F.lit("<html><head>"), F.lit("</head><body><p>"),
        body, F.lit("</p></body></html>"),
    )
    return docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".test/"),
                 doc_id.cast("string")).alias("url"),
        F.encode(page, "UTF-8").alias("html"),
    )


def charset_sniff_frame(pages: DataFrame) -> DataFrame:
    page = F.decode(F.col("html"), "UTF-8")
    feats = pages.select(
        "url",
        F.length(F.col("html")).cast("bigint").alias("n_bytes"),
        F.length(page).cast("bigint").alias("n_chars"),
        F.startswith(page, F.lit(_BOM)).cast("int").alias("has_bom"),
        F.lower(F.regexp_extract(page, _META_RE, 1)).alias("declared"),
    )
    detected = (
        F.when(F.col("has_bom") == 1, F.lit("utf-8-bom"))
        .when(F.col("declared") != "", F.col("declared"))
        .when(F.col("n_bytes") > F.col("n_chars"), F.lit("utf-8"))
        .otherwise(F.lit("ascii"))
    )
    return feats.select(
        "url", "n_bytes", "n_chars", "has_bom", "declared",
        detected.alias("detected"),
    )


def charset_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return charset_sniff_frame(synth_charset_pages(docs))


def _sqlh(salt: str) -> str:
    return sql_hash60(f"doc_id || ':{salt}'")


CHARSET_SNIFF_SQL = f"""
WITH pages AS (
  SELECT 'https://' || source || '.test/' || doc_id AS url,
    CASE WHEN {_sqlh("enc")} % 4 = 0 THEN chr(65279)
         WHEN {_sqlh("enc")} % 4 = 1 THEN '<meta charset="windows-1252">'
         WHEN {_sqlh("enc")} % 4 = 2
           THEN '<meta http-equiv="Content-Type" '
                || 'content="text/html; charset=iso-8859-1">'
         ELSE '' END
    || '<html><head></head><body><p>caf'
    || CASE WHEN {_sqlh("hb")} % 2 = 0 THEN chr(233) ELSE 'e' END
    || ' menu for item ' || doc_id || '</p></body></html>' AS page
  FROM documents
),
f AS (
  SELECT url,
         strlen(page)::BIGINT AS n_bytes,
         length(page)::BIGINT AS n_chars,
         (page LIKE chr(65279) || '%')::INT AS has_bom,
         lower(regexp_extract(page,
             '(?i)<meta[^>]*charset\\s*=\\s*["'']?([a-z0-9_\\-]+)', 1))
           AS declared
  FROM pages
)
SELECT url, n_bytes, n_chars, has_bom, declared,
       CASE WHEN has_bom = 1 THEN 'utf-8-bom'
            WHEN declared <> '' THEN declared
            WHEN n_bytes > n_chars THEN 'utf-8'
            ELSE 'ascii' END AS detected
FROM f
"""


QUERIES: dict[str, tuple] = {
    "web_charset_sniff": (charset_sniff, CHARSET_SNIFF_SQL),
}
