"""C4 badwords gate — blocklist-word page filtering (Raffel et al.
2020, "Exploring the Limits of Transfer Learning": C4 removed any
page containing a word on the "List of Dirty, Naughty, Obscene or
Otherwise Bad Words").  The most consequential — and most criticized
(Dodge et al. 2021 measured what it removes) — of C4's cleanup rules,
so a curation engine must implement it AND report what it matched,
not just drop pages silently.

Semantics (frozen): match is per lowercased whitespace TOKEN against
the blocklist (C4 matched words, not substrings — "class" must not
trip a list entry "ass"); a page is dropped when ANY token matches.
Emitted per doc: total matching-token occurrences ``n_bad``, distinct
matched list words ``n_distinct_bad``, and the C4 verdict ``keep``.
The list here is a four-entry stand-in (the real list's content is
obscene and adds nothing to the mechanism); production swaps the
literal set for the published one — same plan.

The synthetic corpus contains no blocklist tokens, so the registered
query plants both polarities in-engine, identically in the dual:
docs whose 60-bit hash roll is 0 mod 7 get one blocklist token
appended, roll 1 mod 7 two distinct ones; ~71% of docs stay clean.

Plan shape (the scale story): the token scan, the IN-list membership
test, and all three outputs are ONE codegen projection over staged
token arrays — zero exchanges, zero joins, zero Python.  A blocklist
too large for a literal IN (the published list is ~400 words — still
literal-sized) becomes a broadcast hash join against a one-column
table: still zero corpus shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, portable_hash60, sql_hash60, tokens

BADWORDS = ("blockterm", "unsafeword", "nastytoken", "fouledword")

_IN = ", ".join(f"'{w}'" for w in BADWORDS)


def _planted(docs: DataFrame) -> DataFrame:
    roll = portable_hash60(F.concat(F.lit("bad:"), F.col("doc_id"))) % 7
    return docs.select(
        "doc_id",
        F.when(roll == 0, F.concat(F.col("text"), F.lit(" blockterm")))
        .when(
            roll == 1,
            F.concat(F.col("text"), F.lit(" unsafeword nastytoken")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def badwords_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return badwords_frame(_planted(docs))


def badwords_frame(docs: DataFrame) -> DataFrame:
    staged = docs.select("doc_id", tokens(F.col("text")).alias("tok"))
    bad = F.filter(F.col("tok"), lambda t: t.isin(*BADWORDS))
    return staged.select(
        "doc_id",
        F.size(bad).cast("bigint").alias("n_bad"),
        F.size(F.array_distinct(bad)).cast("bigint").alias("n_distinct_bad"),
        (F.size(bad) == 0).alias("keep"),
    )


_TOK = SQL_TOKENS.format(expr="text")
_ROLL = sql_hash60("'bad:' || doc_id")

BADWORDS_SQL = f"""
WITH planted AS (
  SELECT doc_id,
         CASE ({_ROLL}) % 7
           WHEN 0 THEN text || ' blockterm'
           WHEN 1 THEN text || ' unsafeword nastytoken'
           ELSE text END AS text
  FROM documents
),
staged AS (SELECT doc_id, {_TOK} AS tok FROM planted),
b AS (SELECT doc_id, list_filter(tok, t -> t IN ({_IN})) AS bad FROM staged)
SELECT doc_id,
       len(bad)::BIGINT AS n_bad,
       len(list_distinct(bad))::BIGINT AS n_distinct_bad,
       len(bad) = 0 AS keep
FROM b
"""


QUERIES: dict[str, tuple] = {
    "corpus_badwords_filter": (badwords_filter, BADWORDS_SQL),
}
