"""Homoglyph / mixed-script confusable detection — Unicode UTS #39
("Unicode Security Mechanisms", the confusable-skeleton + mixed-script
spoof checks browsers and registrars run on IDNs).  On the web corpus
side the same signal catches keyword-stuffing spam and
filter-evasion text where Latin letters are swapped for visually
identical Cyrillic/Greek codepoints ("pаypal" with U+0430) — such
tokens defeat exact dedup, blocklists, and n-gram LMs unless folded
back to their skeleton first.

Semantics (frozen):

* ``n_cyrillic`` / ``n_greek`` — per-doc counts of characters in
  those scripts (char count minus count after deleting the script
  class; Spark Java-regex spells it ``\\p{IsCyrillic}``, DuckDB RE2
  ``\\p{Cyrillic}`` — same character sets, documented pair);
* ``n_mixed_tokens`` — whitespace tokens containing BOTH an ASCII
  Latin letter and a Cyrillic-or-Greek letter: UTS #39's
  mixed-script-confusable shape, the high-precision spoof signal
  (pure-Cyrillic words are just Russian; "pаypal" is an attack);
* ``skeleton_md5`` — md5 after folding a frozen confusable subset
  (а→a е→e о→o с→c р→p х→x ο→o ν→v) back to Latin — the UTS #39
  skeleton operation over the table subset the planting uses;
* ``spoof`` — ``n_mixed_tokens > 0``.

The corpus is ASCII, so the registered query plants both scripts
in-engine, identically in the dual: docs with hash roll 0 mod 5 get
``a/e`` swapped to Cyrillic ``а/е``, roll 1 mod 5 gets ``o`` swapped
to Greek omicron ``ο``; ~60% stay clean (both polarities driver-
certified).

Plan shape (the scale story): planting, script counts, the token
HOF, the fold, and the md5 are ONE codegen projection riding the
scan — zero exchanges, zero joins, zero Python.  At 10^12 docs this
costs what the scan costs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, portable_hash60, sql_hash60, tokens

# frozen confusable fold (UTS #39 table subset): source chars -> Latin
_CONF_FROM = "аесрхоνο"   # Cyrillic a e s(c) r(p) h(x) o, Greek nu + omicron
_CONF_TO = "aecpxovo"

_CYR = r"\p{IsCyrillic}"       # Spark (Java regex)
_GRK = r"\p{IsGreek}"
_CYR_DUCK = r"\p{Cyrillic}"    # DuckDB (RE2)
_GRK_DUCK = r"\p{Greek}"


def _planted(docs: DataFrame) -> DataFrame:
    roll = portable_hash60(F.concat(F.lit("glyph:"), F.col("doc_id"))) % 5
    return docs.select(
        "doc_id",
        F.when(roll == 0, F.translate(F.col("text"), "ae", "ае"))
        .when(roll == 1, F.translate(F.col("text"), "o", "ο"))
        .otherwise(F.col("text"))
        .alias("text"),
    )


def homoglyph_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return homoglyph_frame(_planted(docs))


def homoglyph_frame(docs: DataFrame) -> DataFrame:
    txt = F.col("text")
    n_cyr = F.length(txt) - F.length(F.regexp_replace(txt, _CYR, ""))
    n_grk = F.length(txt) - F.length(F.regexp_replace(txt, _GRK, ""))
    staged = docs.select(
        "doc_id",
        "text",
        n_cyr.cast("bigint").alias("n_cyrillic"),
        n_grk.cast("bigint").alias("n_greek"),
        tokens(txt).alias("tok"),
    )
    mixed = F.filter(
        F.col("tok"),
        lambda t: t.rlike("[a-zA-Z]") & t.rlike(f"[{_CYR}{_GRK}]"),
    )
    return staged.select(
        "doc_id",
        "n_cyrillic",
        "n_greek",
        F.size(mixed).cast("bigint").alias("n_mixed_tokens"),
        (F.size(mixed) > 0).alias("spoof"),
        F.md5(F.translate(F.col("text"), _CONF_FROM, _CONF_TO)).alias(
            "skeleton_md5"
        ),
    )


_TOK = SQL_TOKENS.format(expr="text")
_ROLL = sql_hash60("'glyph:' || doc_id")

HOMOGLYPH_SQL = f"""
WITH planted AS (
  SELECT doc_id,
         CASE ({_ROLL}) % 5
           WHEN 0 THEN translate(text, 'ae', 'ае')
           WHEN 1 THEN translate(text, 'o', 'ο')
           ELSE text END AS text
  FROM documents
),
staged AS (
  SELECT doc_id, text,
         (length(text) - length(regexp_replace(text, '{_CYR_DUCK}', '', 'g')))::BIGINT AS n_cyrillic,
         (length(text) - length(regexp_replace(text, '{_GRK_DUCK}', '', 'g')))::BIGINT AS n_greek,
         {_TOK} AS tok
  FROM planted
),
m AS (
  SELECT doc_id, n_cyrillic, n_greek, text,
         list_filter(tok, t -> regexp_matches(t, '[a-zA-Z]')
                           AND regexp_matches(t, '[{_CYR_DUCK}{_GRK_DUCK}]')) AS mixed
  FROM staged
)
SELECT doc_id, n_cyrillic, n_greek,
       len(mixed)::BIGINT AS n_mixed_tokens,
       len(mixed) > 0 AS spoof,
       md5(translate(text, '{_CONF_FROM}', '{_CONF_TO}')) AS skeleton_md5
FROM m
"""


QUERIES: dict[str, tuple] = {
    "text_homoglyph_scan": (homoglyph_scan, HOMOGLYPH_SQL),
}
