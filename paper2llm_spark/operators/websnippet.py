"""Query-biased snippet extraction — the result-page passage picker
(Luhn 1958's significance windows; Tombros & Sanderson SIGIR 1998
established query-biased summaries; every serving stack runs this
over the top-k).  For each query's rank-1 BM25 document: the
``SNIP_W``-token window with the most query-term hits, leftmost on
ties, emitted with its hit count and the snippet text itself.

Composes `search_bm25_topk` verbatim (rank-1 selection) and the
SAME query-synthesis rule (first ``QUERY_TERMS`` distinct tokens of
every ``QUERY_EVERY``-th doc) — a green row transitively
re-certifies the ranker's head.

Semantics (frozen): hits ``h_i = 1`` iff token i is one of the
query's terms; window score ``s_i = sum(h[i .. i+W-1])`` for
``i = 1 .. max(n-W+1, 1)`` (short docs: one whole-doc window);
``start = leftmost argmax``, ``n_hits = s_start``; ``snippet`` =
the W tokens from ``start`` joined by single spaces.  All integer;
the snippet string is deterministic.

Plan shape (the scale story): snippet generation runs on the
RESULT SET, not the corpus — the (query, doc) pairs are the
|queries|-bounded rank-1 rows, BROADCAST onto the doc scan (one
pruned pass; only matched docs evaluate the window fold), and the
per-doc cost is O(n·W) HOF arithmetic on one row each.  That is
the production shape: snippets are a result-page cost, never a
corpus cost.  Zero Python; the only exchanges are the composed
ranker's own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from .websearch import (
    BM25_TOPK_SQL, QUERY_EVERY, QUERY_TERMS, bm25_topk_frame,
)

SNIP_W = 10


def snippets_frame(docs: DataFrame) -> DataFrame:
    top1 = bm25_topk_frame(docs).filter(F.col("rank") == 1).select(
        "query_id", "doc_id"
    )
    qarr = docs.filter(F.col("doc_id") % QUERY_EVERY == 0).select(
        F.col("doc_id").alias("query_id"),
        F.slice(F.array_distinct(tokens(F.col("text"))), 1, QUERY_TERMS)
        .alias("qterms"),
    )
    base = (
        docs.select("doc_id", tokens(F.col("text")).alias("tok"))
        .join(F.broadcast(top1), "doc_id")
        .join(F.broadcast(qarr), "query_id")
    )
    staged = base.select(
        "query_id",
        "doc_id",
        "tok",
        F.expr(
            "transform(tok, t -> if(array_contains(qterms, t), 1, 0))"
        ).alias("h"),
        F.size("tok").alias("n"),
    )
    scored = staged.select(
        "query_id",
        "doc_id",
        "tok",
        F.expr(
            f"transform(sequence(1, greatest(n - {SNIP_W} + 1, 1)),"
            f" i -> aggregate(slice(h, i, {SNIP_W}), 0, (a, v) -> a + v))"
        ).alias("sums"),
    )
    return scored.select(
        "query_id",
        "doc_id",
        F.expr("array_position(sums, array_max(sums))")
        .cast("bigint")
        .alias("start"),
        F.expr("array_max(sums)").cast("bigint").alias("n_hits"),
        F.expr(
            f"array_join(slice(tok,"
            f" cast(array_position(sums, array_max(sums)) as int),"
            f" {SNIP_W}), ' ')"
        ).alias("snippet"),
    )


def snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return snippets_frame(docs)


_TOK = ("list_filter(string_split_regex(lower(text), '\\s+'),"
        " t -> length(t) > 0)")

SNIPPETS_SQL = f"""
WITH top1 AS (
  SELECT query_id, doc_id FROM ({BM25_TOPK_SQL}) WHERE rank = 1
),
qarr AS (
  SELECT doc_id AS query_id,
         list_filter(tok, (t, i) -> list_position(tok, t) = i)
           [1:{QUERY_TERMS}] AS qterms
  FROM (SELECT doc_id, {_TOK} AS tok FROM documents)
  WHERE doc_id % {QUERY_EVERY} = 0
),
base AS (
  SELECT t1.query_id, t1.doc_id, d.tok, q.qterms
  FROM top1 t1
  JOIN (SELECT doc_id, {_TOK} AS tok FROM documents) d USING (doc_id)
  JOIN qarr q USING (query_id)
),
staged AS (
  SELECT query_id, doc_id, tok,
         list_transform(tok,
           t -> CASE WHEN list_contains(qterms, t) THEN 1 ELSE 0 END) AS h,
         len(tok) AS n
  FROM base
),
scored AS (
  SELECT query_id, doc_id, tok,
         list_transform(range(1, greatest(n - {SNIP_W} + 1, 1) + 1),
           i -> list_sum(h[i:i + {SNIP_W} - 1])) AS sums
  FROM staged
)
SELECT query_id, doc_id,
       list_position(sums, list_max(sums))::BIGINT AS start,
       list_max(sums)::BIGINT AS n_hits,
       array_to_string(
         tok[list_position(sums, list_max(sums)):
             list_position(sums, list_max(sums)) + {SNIP_W} - 1],
         ' ') AS snippet
FROM scored
"""


QUERIES: dict[str, tuple] = {
    "search_snippets": (snippets, SNIPPETS_SQL),
}
