"""CCAligned-style URL-based cross-language document alignment
(El-Kishky, Chaudhary, Guzmán & Koehn, EMNLP 2020: "CCAligned: A
Massive Collection of Cross-Lingual Web-Document Pairs").  The
paper's key move needs NO content comparison: multilingual sites
encode language in the URL (``/en/``, ``/fr/``, ``?lang=de``), so
stripping the language identifier yields an alignment key, and
documents sharing a key are translations of each other.  Run over
Common Crawl this produced 392M aligned pairs — the seed corpus for
large-scale MT.

Semantics (frozen): language identifiers are recognized in two
frozen positions — a path segment ``/xx/`` and a ``lang=xx`` query
parameter — for the ISO-639-1 subset the fixture plants
(en/fr/de/es, the paper's supported-language table stands behind the
same regexp at production); the alignment key is the url with the
identifier deleted; pairs are emitted ENGLISH-PIVOTED exactly as the
corpus ships: ``(key, url_en, url_xx, lang)``, one row per
non-English member of a key that HAS an English member (keys without
an English page emit nothing — both polarities planted).

The driver corpus has no url column, so the registered query
synthesizes site-structured urls in-engine: doc groups of 4 share a
``(site, page)``; members carry en/fr/de/es in path or query form by
hash roll, and ~1/4 of groups get their English member withheld.

Plan shape (the scale story): key derivation is codegen string work
in the scan task; the English side collapses to ONE row per key
before the join (groupBy + min — the pivot is unique by
construction, min is the deterministic tie rule), so the equi-join
on key is pivot-sized vs corpus-sized — no pair explosion, no
broadcast of anything corpus-sized.  Two short-row exchanges
(key collapse + join), zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60

LANGS = ("en", "fr", "de", "es")
_LANG_ALT = "|".join(LANGS)


def _h(doc_id: Column, salt: str) -> Column:
    return portable_hash60(F.concat(doc_id.cast("string"), F.lit(":" + salt)))


def synth_ccalign_urls(docs: DataFrame) -> DataFrame:
    doc_id = F.col("doc_id")
    lang_i = (doc_id % 4).cast("int")
    lang = (
        F.when(lang_i == 0, LANGS[0]).when(lang_i == 1, LANGS[1])
        .when(lang_i == 2, LANGS[2]).otherwise(LANGS[3])
    )
    site = F.concat(
        F.lit("https://site"), F.expr("(doc_id div 4) % 20"), F.lit(".test")
    )
    page = F.concat(F.lit("page"), F.expr("doc_id div 4"))
    path_form = F.concat(site, F.lit("/"), lang, F.lit("/"), page)
    query_form = F.concat(site, F.lit("/"), page, F.lit("?lang="), lang)
    url = F.when(_h(doc_id, "ccform") % 2 == 0, path_form).otherwise(
        query_form
    )
    # withhold the English member for ~1/4 of groups: those groups
    # must emit nothing (the negative polarity)
    keep = ~(
        (lang_i == 0)
        & (portable_hash60(F.concat(F.lit("ccdrop:"), F.expr("doc_id div 4"))) % 4 == 0)
    )
    return docs.filter(keep).select(url.alias("url"), lang.alias("lang"))


def _key(url: Column) -> Column:
    stripped = F.regexp_replace(url, f"/({_LANG_ALT})/", "/")
    return F.regexp_replace(stripped, f"[?&]lang=({_LANG_ALT})", "")


def ccaligned_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return ccaligned_frame(synth_ccalign_urls(docs))


def ccaligned_frame(pages: DataFrame) -> DataFrame:
    keyed = pages.select(
        _key(F.col("url")).alias("key"), "url", "lang"
    )
    en = (
        keyed.filter(F.col("lang") == "en")
        .groupBy("key")
        .agg(F.min("url").alias("url_en"))
    )
    other = keyed.filter(F.col("lang") != "en")
    return other.join(en, "key").select(
        "key", "url_en", F.col("url").alias("url_xx"), "lang"
    )


_ROLL_FORM = sql_hash60("doc_id || ':ccform'")
_ROLL_DROP = sql_hash60("'ccdrop:' || (doc_id // 4)")

CCALIGN_SQL = f"""
WITH synth AS (
  SELECT CASE WHEN ({_ROLL_FORM}) % 2 = 0
         THEN 'https://site' || ((doc_id // 4) % 20) || '.test/' ||
              (['en','fr','de','es'])[(doc_id % 4) + 1] || '/page' || (doc_id // 4)
         ELSE 'https://site' || ((doc_id // 4) % 20) || '.test/page' || (doc_id // 4)
              || '?lang=' || (['en','fr','de','es'])[(doc_id % 4) + 1]
         END AS url,
         (['en','fr','de','es'])[(doc_id % 4) + 1] AS lang
  FROM documents
  WHERE NOT (doc_id % 4 = 0 AND ({_ROLL_DROP}) % 4 = 0)
),
keyed AS (
  SELECT regexp_replace(regexp_replace(url, '/({_LANG_ALT})/', '/'),
                        '[?&]lang=({_LANG_ALT})', '') AS key,
         url, lang
  FROM synth
),
en AS (SELECT key, min(url) AS url_en FROM keyed WHERE lang = 'en' GROUP BY 1)
SELECT keyed.key, en.url_en, keyed.url AS url_xx, keyed.lang
FROM keyed JOIN en USING (key)
WHERE keyed.lang <> 'en'
"""


QUERIES: dict[str, tuple] = {
    "web_ccaligned_pairs": (ccaligned_pairs, CCALIGN_SQL),
}
