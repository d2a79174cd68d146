"""Heaps'-law vocabulary growth curve (Heaps 1978; Herdan 1960) —
vocabulary size as a function of corpus size, the standard diagnostic
for "how much NEW vocabulary does the next crawl snapshot buy":
V(n) ≈ K·n^β, and a measured curve that flattens early says the
corpus is saturating (more of the same), while a steep tail says the
long tail is still being discovered.  Tokenizer sizing and dedup-rate
forecasting both read this curve.

Semantics (frozen): documents ordered by ``doc_id`` (the corpus's
stable ingest order); 10 checkpoints at ``doc_id < (j·n) div 10``
for j = 1..10 (exact integer decile bounds over n docs).  Per
checkpoint: ``docs_cum`` (documents before the bound), ``tokens_cum``
(their total lowercased-whitespace token count), and ``vocab_cum``
(distinct words whose FIRST occurrence — min doc_id — lies before
the bound).  The curve is exact, not sampled.

The fixture corpus has a closed ~31-word vocabulary (every word
appears in the first decile — a flat curve would verify nothing), so
the registered query plants long-tail growth in-engine, identically
in the dual: docs whose hash roll is 0 mod 3 append a window-fresh
token ``nw{doc_id div 25}`` — one new vocabulary item per 25-doc
stretch, so ``vocab_cum`` strictly grows across all 10 checkpoints
and the driver hash certifies the first-occurrence logic, not a
constant.

Plan shape (the scale story): a word's first occurrence is ONE
map-side-combinable ``groupBy(word).min(doc_id)`` — the word-count
shuffle shape; per-doc token counts ride the scan.  Checkpointing
joins each of the two collapsed tables (vocabulary-sized and
doc-count-sized) against a 10-ROW literal bound table — a broadcast
nested loop over already-collapsed rows, never over the corpus.  At
10^12 docs the plan is one word shuffle + one short-row doc
aggregate; the 10x fanout applies only to collapsed rows.  Zero
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, portable_hash60, sql_hash60, tokens

N_CHECKPOINTS = 10


def _planted(docs: DataFrame) -> DataFrame:
    roll = portable_hash60(F.concat(F.lit("heaps:"), F.col("doc_id"))) % 3
    return docs.select(
        "doc_id",
        F.when(
            roll == 0,
            F.concat(
                F.col("text"), F.lit(" nw"), F.expr("doc_id div 25")
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return heaps_frame(spark, _planted(docs))


def heaps_frame(spark: SparkSession, docs: DataFrame) -> DataFrame:
    n = docs.count()
    cps = spark.range(1, N_CHECKPOINTS + 1).select(
        F.col("id").cast("bigint").alias("j"),
        F.expr(f"id * {n} div {N_CHECKPOINTS}").cast("bigint").alias("bound"),
    )
    first = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    vocab = (
        first.join(
            F.broadcast(cps), F.col("first_doc") < F.col("bound"), "inner"
        )
        .groupBy("j")
        .agg(F.count(F.lit(1)).cast("bigint").alias("vocab_cum"))
    )
    per_doc = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n_tok")
    )
    sizes = (
        per_doc.join(
            F.broadcast(cps), F.col("doc_id") < F.col("bound"), "inner"
        )
        .groupBy("j")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs_cum"),
            F.sum("n_tok").cast("bigint").alias("tokens_cum"),
        )
    )
    return sizes.join(vocab, "j").select(
        "j", "docs_cum", "tokens_cum", "vocab_cum"
    )


_TOK = SQL_TOKENS.format(expr="text")
_ROLL = sql_hash60("'heaps:' || doc_id")

HEAPS_SQL = f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN ({_ROLL}) % 3 = 0
              THEN text || ' nw' || (doc_id // 25)
              ELSE text END AS text
  FROM documents
),
n AS (SELECT count(*) AS n FROM documents),
cps AS (SELECT j::BIGINT AS j, (j * n.n // {N_CHECKPOINTS})::BIGINT AS bound
        FROM range(1, {N_CHECKPOINTS + 1}) t(j), n),
t AS (SELECT doc_id, {_TOK} AS tok FROM planted),
first AS (
  SELECT w, min(doc_id) AS first_doc
  FROM t, unnest(tok) AS u(w) GROUP BY w
),
vocab AS (
  SELECT j, count(*)::BIGINT AS vocab_cum
  FROM first JOIN cps ON first.first_doc < cps.bound GROUP BY j
),
per_doc AS (SELECT doc_id, len(tok) AS n_tok FROM t),
sizes AS (
  SELECT j, count(*)::BIGINT AS docs_cum, sum(n_tok)::BIGINT AS tokens_cum
  FROM per_doc JOIN cps ON per_doc.doc_id < cps.bound GROUP BY j
)
SELECT j, docs_cum, tokens_cum, vocab_cum FROM sizes JOIN vocab USING (j)
"""


QUERIES: dict[str, tuple] = {
    "corpus_heaps_curve": (heaps_curve, HEAPS_SQL),
}
