"""Title-body coherence / title-stuffing detection (Ntoulas, Najork,
Manasse & Fetterly, WWW 2006 "Detecting spam web pages through
content analysis" — their title-keyword features; the SEO-spam shape
is a clickbait/keyword-stuffed ``<title>`` unrelated to the body).
Quality pipelines score it because the title feeds search snippets,
dedup keys, and citation metadata — a stuffed title poisons all
three.

Semantics (frozen): title extracted from ``<title>…</title>``
(quoted-subset extractor contract); per page —

* ``n_title_tokens`` — lowercased whitespace tokens in the title;
* ``overlap_micro``  — ``1e6 · |distinct title ∩ distinct body|
  div |distinct title|`` (token-set containment of the title in the
  body — a coherent title is drawn from body vocabulary);
* ``caps_micro``     — ``1e6 · [A-Z] count div letter count`` of the
  RAW title (shouting titles);
* ``title_spam``     — ``overlap_micro < 500000`` (the majority-
  containment rule; stuffed titles share ~no vocabulary).

The corpus has no html column: the registered query synthesizes
pages in-engine — titles are either the document's own first 5
tokens (coherent) or a frozen 8-word stuffing phrase, independently
upper-cased by a second roll, so every feature and both verdict
polarities are driver-certified.

Plan shape (the scale story): synthesis, extraction, token HOFs and
all four outputs are ONE codegen projection riding the scan — zero
exchanges, zero joins, zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, portable_hash60, sql_hash60, tokens

STUFFING = "buy cheap deal now sale free best offer"
SPAM_THRESHOLD_MICRO = 500_000


def _h(doc_id: Column, salt: str) -> Column:
    return portable_hash60(F.concat(doc_id.cast("string"), F.lit(":" + salt)))


def synth_title_pages(docs: DataFrame) -> DataFrame:
    doc_id = F.col("doc_id")
    coherent = F.array_join(F.slice(tokens(F.col("text")), 1, 5), " ")
    raw = F.when(_h(doc_id, "tsp") % 3 == 0, F.lit(STUFFING)).otherwise(
        coherent
    )
    title = F.when(_h(doc_id, "tcaps") % 4 == 0, F.upper(raw)).otherwise(raw)
    return docs.select(
        F.concat(F.lit("https://title.test/"), doc_id).alias("url"),
        F.encode(
            F.concat(
                F.lit("<html><head><title>"), title,
                F.lit("</title></head><body>"), F.col("text"),
                F.lit("</body></html>"),
            ),
            "utf-8",
        ).alias("html"),
    )


def title_spam(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return title_spam_frame(synth_title_pages(docs))


def title_spam_frame(pages: DataFrame) -> DataFrame:
    page = F.decode(F.col("html"), "utf-8")
    raw_title = F.regexp_extract(page, r"<title>(.*?)</title>", 1)
    body = F.regexp_extract(page, r"<body>(.*?)</body>", 1)
    staged = pages.select(
        "url",
        raw_title.alias("raw_title"),
        F.array_distinct(tokens(raw_title)).alias("tt"),
        F.array_distinct(tokens(body)).alias("bt"),
    )
    inter = F.size(
        F.filter(F.col("tt"), lambda t: F.array_contains(F.col("bt"), t))
    )
    upper = F.length(F.col("raw_title")) - F.length(
        F.regexp_replace(F.col("raw_title"), "[A-Z]", "")
    )
    letters = F.length(F.col("raw_title")) - F.length(
        F.regexp_replace(F.col("raw_title"), "[A-Za-z]", "")
    )
    return staged.select(
        "url",
        F.size("tt").cast("bigint").alias("n_title_tokens"),
        (F.lit(1_000_000) * inter).cast("bigint").alias("_num"),
        F.greatest(F.size("tt"), F.lit(1)).alias("_den"),
        (F.lit(1_000_000) * upper).cast("bigint").alias("_cnum"),
        F.greatest(letters, F.lit(1)).alias("_cden"),
    ).select(
        "url",
        "n_title_tokens",
        F.expr("_num div _den").cast("bigint").alias("overlap_micro"),
        F.expr("_cnum div _cden").cast("bigint").alias("caps_micro"),
        F.expr(f"_num div _den < {SPAM_THRESHOLD_MICRO}").alias("title_spam"),
    )


_TOK_T = SQL_TOKENS.format(expr="raw_title")
_TOK_B = SQL_TOKENS.format(expr="body")
_ROLL_S = sql_hash60("doc_id || ':tsp'")
_ROLL_C = sql_hash60("doc_id || ':tcaps'")
_COHERENT = (
    "array_to_string(list_slice("
    + SQL_TOKENS.format(expr="text")
    + ", 1, 5), ' ')"
)

TITLE_SPAM_SQL = f"""
WITH synth AS (
  SELECT 'https://title.test/' || doc_id AS url,
         '<html><head><title>' ||
         CASE WHEN ({_ROLL_C}) % 4 = 0
              THEN upper(CASE WHEN ({_ROLL_S}) % 3 = 0
                              THEN '{STUFFING}' ELSE {_COHERENT} END)
              ELSE CASE WHEN ({_ROLL_S}) % 3 = 0
                        THEN '{STUFFING}' ELSE {_COHERENT} END
         END || '</title></head><body>' || text || '</body></html>' AS page
  FROM documents
),
ex AS (
  SELECT url,
         regexp_extract(page, '<title>(.*?)</title>', 1) AS raw_title,
         regexp_extract(page, '<body>(.*?)</body>', 1) AS body
  FROM synth
),
staged AS (
  SELECT url, raw_title,
         list_distinct({_TOK_T}) AS tt,
         list_distinct({_TOK_B}) AS bt
  FROM ex
),
m AS (
  SELECT url,
         len(tt)::BIGINT AS n_title_tokens,
         1000000 * len(list_filter(tt, t -> list_contains(bt, t))) AS num,
         greatest(len(tt), 1) AS den,
         1000000 * (length(raw_title)
                    - length(regexp_replace(raw_title, '[A-Z]', '', 'g')))
           AS cnum,
         greatest(length(raw_title)
                  - length(regexp_replace(raw_title, '[A-Za-z]', '', 'g')),
                  1) AS cden
  FROM staged
)
SELECT url, n_title_tokens,
       (num // den)::BIGINT AS overlap_micro,
       (cnum // cden)::BIGINT AS caps_micro,
       num // den < {SPAM_THRESHOLD_MICRO} AS title_spam
FROM m
"""


QUERIES: dict[str, tuple] = {
    "web_title_spam": (title_spam, TITLE_SPAM_SQL),
}
