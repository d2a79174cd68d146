"""Corpus datasheet — the per-source release-statistics table every
published pretraining corpus ships (Dolma's summary stats, FineWeb's
dataset card, Gebru et al. "Datasheets for Datasets"): for each
(source, lang) cell, document/token/char totals, exact-duplicate rate,
and the cell's share of its source — the numbers a consumer reads
before mixing the source into a training run.

One row per (source, lang):

- ``n_docs``, ``n_unique`` (distinct md5 digests — the exact-dup
  measurement Dolma reports), ``dup_rate_micro``;
- ``tokens_total``, ``chars_total``, ``tokens_per_doc`` (exact integer
  div);
- ``docs_share_micro``: the cell's fraction of its source's documents.

Plan shape (the scale story): token/char/digest are codegen in the
scan task; ONE corpus-sized exchange — the map-side-combinable
``groupBy(source, lang)`` whose partial rows carry five integers plus
the distinct-digest expansion (Spark plans ``count(DISTINCT)`` as the
standard two-phase partial-agg over (keys, digest), still map-side
deduplicating); the per-source roll-up re-aggregates the already-tiny
cell table and re-enters by broadcast.  At 10^12 documents nothing
but (source, lang, digest) short rows ever shuffles.

Reference scope anchor: beyond-reference web-scale operator (corpus
release engineering); composes the measurement side of
`dedup_exact` (operators/dedup.py) and the mixture operators
(webselect.py, webtemp.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60, tokens

MICRO = 1_000_000
DUP_MOD = 11  # ~9% of docs re-ingested once (planted exact dups)


def synth_release(docs: DataFrame) -> DataFrame:
    """documents -> the release corpus: every doc once, plus a
    hash-rolled ~9% re-ingested verbatim (the double-crawl dups a real
    release measures); byte-identical in the DuckDB dual."""
    dup_roll = portable_hash60(
        F.concat(F.col("doc_id").cast("string"), F.lit(":card"))
    ) % DUP_MOD == 0
    return docs.unionByName(docs.filter(dup_roll))


def datasheet_frame(docs: DataFrame) -> DataFrame:
    staged = docs.select(
        "source", "lang",
        F.md5(F.col("text")).alias("digest"),
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tok"),
        F.length("text").cast("bigint").alias("n_chr"),
    )
    cells = staged.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.col("digest")).alias("n_unique"),
        F.sum("n_tok").alias("tokens_total"),
        F.sum("n_chr").alias("chars_total"),
    )
    per_source = cells.groupBy("source").agg(
        F.sum("n_docs").alias("source_docs"))
    return cells.join(F.broadcast(per_source), "source").select(
        "source", "lang", "n_docs", "n_unique",
        F.expr(f"({MICRO} * (n_docs - n_unique)) div n_docs")
        .alias("dup_rate_micro"),
        "tokens_total", "chars_total",
        F.expr("tokens_total div n_docs").alias("tokens_per_doc"),
        F.expr(f"({MICRO} * n_docs) div source_docs")
        .alias("docs_share_micro"),
    )


def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return datasheet_frame(synth_release(docs))


_DUP_ROLL = sql_hash60("doc_id || ':card'")

DATASHEET_SQL = f"""
WITH release AS (
  SELECT * FROM documents
  UNION ALL
  SELECT * FROM documents WHERE ({_DUP_ROLL}) % {DUP_MOD} = 0
),
staged AS (
  SELECT source, lang, md5(text) AS digest,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> length(t) > 0))::BIGINT AS n_tok,
         length(text)::BIGINT AS n_chr
  FROM release
),
cells AS (
  SELECT source, lang,
         count(*)::BIGINT AS n_docs,
         count(DISTINCT digest)::BIGINT AS n_unique,
         sum(n_tok)::BIGINT AS tokens_total,
         sum(n_chr)::BIGINT AS chars_total
  FROM staged GROUP BY source, lang
),
per_source AS (
  SELECT source, sum(n_docs)::BIGINT AS source_docs
  FROM cells GROUP BY source
)
SELECT c.source, c.lang, c.n_docs, c.n_unique,
       (({MICRO} * (c.n_docs - c.n_unique)) // c.n_docs)::BIGINT
         AS dup_rate_micro,
       c.tokens_total, c.chars_total,
       (c.tokens_total // c.n_docs)::BIGINT AS tokens_per_doc,
       (({MICRO} * c.n_docs) // p.source_docs)::BIGINT
         AS docs_share_micro
FROM cells c JOIN per_source p ON c.source = p.source
"""


QUERIES: dict[str, tuple] = {
    "corpus_datasheet": (corpus_datasheet, DATASHEET_SQL),
}
