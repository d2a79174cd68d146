"""Pseudo-relevance-feedback query expansion — RM1-style term
selection from the BM25 top-k (Rocchio 1971 started it; Lavrenko &
Croft SIGIR 2001 relevance models; RM3 is the standard strong
baseline every IR toolkit ships as `-rm3`).  For each query: the
terms that best characterize its pseudo-relevant set, ready to be
OR'd into a second retrieval round.

Composes `search_bm25_topk` verbatim (the full top-K this time) —
a green row re-certifies the ranker under a third driver hash
(snippets took rank 1; this consumes the whole list).

Semantics (frozen): candidate terms = all tokens of the query's
top-K documents MINUS the query's own terms; per (query, term):
``tf_total`` = total occurrences across the pseudo-relevant set,
``idf_micro = floor(ln((N + 1) / (df + 1)) * 1e6 + 0.5)`` (the
+1-smoothed idf as ONE shape-identical double ln, the websearch
discipline), ``score_micro = tf_total * idf_micro`` (exact bigint
product); top ``EXPAND_K = 5`` per query by (score desc, term asc).

Plan shape (the scale story): expansion works on the RESULT SET —
the (query, doc) top-K pairs broadcast onto the doc scan, so only
K x |queries| documents explode their tokens; df re-enters by
BROADCAST from the corpus df table (the one corpus-sized exchange,
shared shape with BM25's own df pass); the rank window keys
(query_id) short rows.  Zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from .websearch import (
    BM25_TOPK_SQL, QUERY_EVERY, QUERY_TERMS, bm25_topk_frame,
)

EXPAND_K = 5
MICRO = 1_000_000


def query_expansion_frame(docs: DataFrame) -> DataFrame:
    base = docs.select("doc_id", tokens(F.col("text")).alias("tok"))
    topk = bm25_topk_frame(docs).select("query_id", "doc_id")
    qterms = base.filter(F.col("doc_id") % QUERY_EVERY == 0).select(
        F.col("doc_id").alias("query_id"),
        F.explode(
            F.slice(F.array_distinct("tok"), 1, QUERY_TERMS)
        ).alias("term"),
    ).distinct()
    n_docs = docs.agg(F.count("*").cast("bigint").alias("n"))
    dfs = (
        base.select("doc_id", F.explode(F.array_distinct("tok")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("df"))
    )
    cand = (
        base.join(F.broadcast(topk), "doc_id")
        .select("query_id", F.explode("tok").alias("term"))
        .groupBy("query_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf_total"))
        .join(F.broadcast(qterms), ["query_id", "term"], "left_anti")
        .join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(n_docs))
    )
    scored = cand.select(
        "query_id",
        "term",
        "tf_total",
        F.expr(
            f"cast(floor(ln((n + 1) / (df + 1)) * {MICRO} + 0.5) as bigint)"
        ).alias("idf_micro"),
    ).select(
        "query_id",
        "term",
        "tf_total",
        "idf_micro",
        F.expr("tf_total * idf_micro").cast("bigint").alias("score_micro"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("term").asc()
    )
    return scored.select(
        "query_id",
        F.row_number().over(w).cast("bigint").alias("rank"),
        "term",
        "tf_total",
        "score_micro",
    ).filter(F.col("rank") <= EXPAND_K)


def query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return query_expansion_frame(docs)


_TOK = ("list_filter(string_split_regex(lower(text), '\\s+'),"
        " t -> length(t) > 0)")

QUERY_EXPANSION_SQL = f"""
WITH base AS (SELECT doc_id, {_TOK} AS tok FROM documents),
topk AS (SELECT query_id, doc_id FROM ({BM25_TOPK_SQL})),
qterms AS (
  SELECT DISTINCT doc_id AS query_id,
         unnest(list_filter(tok, (t, i) -> list_position(tok, t) = i)
                [1:{QUERY_TERMS}]) AS term
  FROM base WHERE doc_id % {QUERY_EVERY} = 0
),
n1 AS (SELECT count(*)::BIGINT AS n FROM documents),
dfs AS (
  SELECT term, count(*)::BIGINT AS df
  FROM (SELECT doc_id, unnest(list_distinct(tok)) AS term FROM base)
  GROUP BY 1
),
cand AS (
  SELECT t.query_id, x.term, count(*)::BIGINT AS tf_total
  FROM topk t
  JOIN (SELECT doc_id, unnest(tok) AS term FROM base) x USING (doc_id)
  GROUP BY 1, 2
),
filtered AS (
  SELECT c.query_id, c.term, c.tf_total
  FROM cand c
  ANTI JOIN qterms q ON q.query_id = c.query_id AND q.term = c.term
),
scored AS (
  SELECT f.query_id, f.term, f.tf_total,
         floor(ln((n + 1) / (df + 1)) * {MICRO} + 0.5)::BIGINT AS idf_micro
  FROM filtered f JOIN dfs USING (term), n1
)
SELECT query_id, rank, term, tf_total, score_micro
FROM (
  SELECT query_id, term, tf_total,
         (tf_total * idf_micro)::BIGINT AS score_micro,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY tf_total * idf_micro DESC, term ASC
                           )::BIGINT AS rank
  FROM scored
)
WHERE rank <= {EXPAND_K}
"""


QUERIES: dict[str, tuple] = {
    "search_query_expansion": (query_expansion, QUERY_EXPANSION_SQL),
}
