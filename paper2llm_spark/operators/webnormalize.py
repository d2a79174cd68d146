"""Text normalization & paragraph-level cleanup (SURVEY.md §2.11) —
the canonicalization layer between raw extraction and dedup/tokenize.

* **Unicode NFC normalization** (every production pipeline's first text
  pass; Dolma/CCNet normalize before hashing so byte-different but
  canonically-equal text dedups together): NFC-compose, strip C0/C1
  control characters (keeping ``\\n``/``\\t``), collapse horizontal
  whitespace runs.  Unicode composition has no Spark builtin, so this
  is the module where the Arrow path is the RIGHT call (input_hint:
  "vectorized pandas/Arrow UDFs (no per-row Python)"): one
  ``pandas_udf`` batch pass, zero shuffles, text dies in the scan task.
  The driver corpus is pure ASCII (the gate would verify nothing), so
  the query prepends a deterministic decomposed sequence —
  ``Cafe`` + U+0301 + theta + U+0301 — to every doc IN BOTH ENGINES;
  NFC must compose them (U+00E9, U+03AD), so `changed` is true
  everywhere, and the md5 of the normalized text pins every byte.
  Cross-engine contract: Python ``unicodedata`` and DuckDB's utf8proc
  both implement canonical composition over the same stable Unicode
  data, and the md5 comparison would catch any divergence loudly.

* **Paragraph-level exact dedup** (Dolma's paragraph dedup / the
  boilerplate-removal flavor of Lee et al. 2022): hash every line,
  keep only the FIRST occurrence corpus-wide (min (doc_id, idx)), and
  reassemble documents without the repeated boilerplate.  Plan shape:
  explode lines -> one map-side-combinable groupBy(line_hash) whose
  output is (hash, keeper) SHORT rows -> equi-join back -> one
  reassembly groupBy(doc_id).  Nothing joins on text; the line payload
  crosses exactly one exchange (the reassembly), the same budget the
  flagship's page assembly pays.  The driver corpus has no newlines,
  so the query synthesizes 8-token '.'-terminated sentences in-engine
  (the webquality technique) and appends TWO deterministic boilerplate
  lines — one to every doc, one to even docs — so the gate verifies
  real cross-document paragraph removal (keeper docs keep them, all
  others drop them).

Both queries carry DuckDB duals with identical column names/values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import SQL_TOKENS, portable_hash60, sql_hash60, tokens

_TOK = SQL_TOKENS.format(expr="text")

# decomposed test prefix: 'Cafe' + combining acute (U+0301), then GREEK
# SMALL LETTER EPSILON + combining acute - NFC composes both (U+00E9,
# U+03AD), so every row demonstrably changes under normalization
_DECOMPOSED_PREFIX = "Cafe\u0301 \u03b5\u0301 "

SENT_TOKENS = 8
BOILERPLATE_ALL = "subscribe to our newsletter for updates."
BOILERPLATE_EVEN = "copyright two thousand twenty six example corp."


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


# ---------------------------------------------------------------------------
# Unicode NFC normalization
# ---------------------------------------------------------------------------

@F.pandas_udf(T.StringType())
def _nfc_normalize(s):  # type: ignore[no-untyped-def]
    import re
    import unicodedata

    import pandas as pd

    ctrl = re.compile(r"[\x00-\x08\x0b-\x1f\x7f-\x9f]")
    hws = re.compile(r"[ \t]+")

    def norm(x):
        if x is None:
            return None
        x = unicodedata.normalize("NFC", x)
        x = ctrl.sub("", x)
        # strip spaces only — the exact mirror of the dual's trim()
        return hws.sub(" ", x).strip(" ")

    return pd.Series([norm(x) for x in s])


def normalize_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, n_before, n_after, changed, norm_md5) for a frame whose
    ``text`` may carry decomposed sequences / controls / tab runs."""
    staged = docs.select(
        "doc_id", "text", _nfc_normalize(F.col("text")).alias("norm")
    )
    return staged.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_before"),
        F.length("norm").cast("bigint").alias("n_after"),
        (F.col("norm") != F.col("text")).alias("changed"),
        F.md5("norm").alias("norm_md5"),
    )


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(F.lit(_DECOMPOSED_PREFIX), F.col("text")).alias("text"),
    )
    return normalize_frame(docs)


# the dual embeds the same decomposed prefix as UTF-8 literals; DuckDB
# strlen counts... NOTE: DuckDB length(varchar) is in CHARACTERS,
# strlen in bytes — Spark length(string) is also characters, so the two
# line up without conversion
_SQL_PREFIX = _DECOMPOSED_PREFIX.replace("'", "''")

TEXT_NORMALIZE_SQL = f"""
WITH d AS (
  SELECT doc_id, '{_SQL_PREFIX}' || text AS text FROM documents
),
n AS (
  SELECT doc_id, text,
         trim(regexp_replace(
             regexp_replace(nfc_normalize(text),
                 '[\\x00-\\x08\\x0b-\\x1f\\x7f-\\x9f]', '', 'g'),
             '[ \\t]+', ' ', 'g'), ' ') AS norm
  FROM d
)
SELECT doc_id,
       length(text)::BIGINT AS n_before,
       length(norm)::BIGINT AS n_after,
       (norm <> text) AS changed,
       md5(norm) AS norm_md5
FROM n
"""


# ---------------------------------------------------------------------------
# Paragraph-level exact dedup (keep first occurrence corpus-wide)
# ---------------------------------------------------------------------------

def _synth_paragraph_lines(docs: DataFrame) -> DataFrame:
    """Deterministic line structure for the newline-free driver corpus:
    8-token '.'-terminated sentences + the two boilerplate lines."""
    staged = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    toks = F.col("toks")
    n_sent = F.expr(
        f"(size(toks) + {SENT_TOKENS - 1}) div {SENT_TOKENS}"
    )
    idx = F.filter(F.sequence(F.lit(0), n_sent), lambda i: i >= 1)
    sent = lambda i: F.concat(  # noqa: E731
        F.array_join(
            F.slice(toks, (i - 1) * SENT_TOKENS + 1, SENT_TOKENS), " "
        ),
        F.lit("."),
    )
    lines = F.concat(
        F.transform(idx, sent),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.array(F.lit(BOILERPLATE_ALL), F.lit(BOILERPLATE_EVEN)),
        ).otherwise(F.array(F.lit(BOILERPLATE_ALL))),
    )
    return staged.select(
        "doc_id", F.posexplode(lines).alias("idx", "line")
    )


def paragraph_dedup_frame(lines: DataFrame) -> DataFrame:
    """(doc_id, n_lines, n_kept, clean_text) — drop every line whose
    hash was first seen in an earlier (doc_id, idx)."""
    hashed = lines.select(
        "doc_id", "idx", "line", portable_hash60(F.col("line")).alias("h")
    )
    keepers = hashed.groupBy("h").agg(
        F.min(F.struct("doc_id", "idx")).alias("keep")
    )
    kept = (
        hashed.join(keepers, "h")
        .withColumn(
            "is_first",
            (F.col("doc_id") == F.col("keep.doc_id"))
            & (F.col("idx") == F.col("keep.idx")),
        )
    )
    return kept.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum(F.col("is_first").cast("bigint")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("is_first"),
                            F.struct("idx", "line"),
                        )
                    )
                ),
                lambda s: s.line,
            ),
            "\n",
        ).alias("clean_text"),
    )


def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return paragraph_dedup_frame(_synth_paragraph_lines(_docs(spark, sf_dir)))


_SYNTH_SENT = (
    f"array_to_string(tok[((i-1)*{SENT_TOKENS}+1):(i*{SENT_TOKENS})], ' ')"
    " || '.'"
)

PARAGRAPH_DEDUP_SQL = f"""
WITH t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
s AS (
  SELECT doc_id,
         list_concat(
           list_transform(range(1, (len(tok) + {SENT_TOKENS - 1})
                                   // {SENT_TOKENS} + 1),
                          i -> {_SYNTH_SENT}),
           CASE WHEN doc_id % 2 = 0
                THEN ['{BOILERPLATE_ALL}', '{BOILERPLATE_EVEN}']
                ELSE ['{BOILERPLATE_ALL}'] END) AS lines
  FROM t
),
x AS (
  SELECT doc_id, i - 1 AS idx, line, {sql_hash60("line")} AS h
  FROM (
    SELECT doc_id,
           unnest(range(1, len(lines) + 1)) AS i,
           unnest(lines) AS line
    FROM s
  )
),
keep AS (
  SELECT h, min({{'doc_id': doc_id, 'idx': idx}}) AS k FROM x GROUP BY h
)
SELECT x.doc_id,
       count(*)::BIGINT AS n_lines,
       sum(CASE WHEN x.doc_id = k.k.doc_id AND x.idx = k.k.idx
                THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       coalesce(string_agg(
         CASE WHEN x.doc_id = k.k.doc_id AND x.idx = k.k.idx
              THEN x.line END, chr(10) ORDER BY x.idx), '') AS clean_text
FROM x JOIN keep k USING (h)
GROUP BY x.doc_id
"""


QUERIES: dict[str, tuple] = {
    "text_normalize_nfc": (text_normalize, TEXT_NORMALIZE_SQL),
    "corpus_paragraph_dedup": (paragraph_dedup, PARAGRAPH_DEDUP_SQL),
}
