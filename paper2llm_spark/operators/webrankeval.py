"""Ranking-quality evaluation — MRR and nDCG@K of the two lexical
rankers against deterministic pseudo-qrels (Järvelin & Kekäläinen
TOIS 2002 defined nDCG; MRR via Voorhees' TREC QA track; comparing
BM25 vs the QL model on the same qrels is the textbook IR eval
table).  Completes the search family's audit arm: recall audits the
ANN indexes, this audits the RANKERS.

Semantics (frozen): pseudo-qrels — document d is relevant to query
q iff d shares >= 2 of q's ``QUERY_TERMS`` distinct terms (binary
relevance, derived from the corpus itself; the query doc trivially
qualifies and stays in, deterministically).  Per (ranker in
{bm25, ql}, query) over that ranker's top-``K`` list:

* ``n_rel``      — relevant docs in the list
* ``mrr_micro``  — ``1e6 div first_relevant_rank`` (0 if none) —
  EXACT integers, no float reciprocal
* ``ndcg_micro`` — DCG with the gain table
  ``G[i] = floor(1e6 / log2(i+1) + 0.5)`` PRECOMPUTED in Python and
  inlined as literals in BOTH engines (log2 of 2..11 — the float
  surface collapses to a shared literal table, the PQ-codebook
  discipline); ``DCG = sum(rel_i * G[i])``,
  ``IDCG = sum(G[1..min(R, K)])`` with R = total relevant for the
  query, ``ndcg_micro = DCG * 1e6 div IDCG`` (0 when R = 0)

Plan shape (the scale story): the rankers do the corpus work (their
own plan-asserted shapes); qrels are a query-term broadcast join
with a >= 2 count (query-bounded rows) and re-enter the K-bounded
rank lists by BROADCAST; per-query metrics are one groupBy over
|rankers| x |queries| x K rows.  Zero Python.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from .websearch import (
    BM25_TOPK_SQL, K, QUERY_EVERY, QUERY_TERMS, bm25_topk_frame,
)
from .webql import QL_TOPK_SQL, ql_topk_frame

MICRO = 1_000_000
REL_MIN_TERMS = 2
GAINS = [int(MICRO / math.log2(i + 1) + 0.5) for i in range(1, K + 1)]


def _qrels(docs: DataFrame) -> DataFrame:
    base = docs.select("doc_id", tokens(F.col("text")).alias("tok"))
    qterms = base.filter(F.col("doc_id") % QUERY_EVERY == 0).select(
        F.col("doc_id").alias("query_id"),
        F.explode(
            F.slice(F.array_distinct("tok"), 1, QUERY_TERMS)
        ).alias("term"),
    ).distinct()
    hits = base.select(
        "doc_id", F.explode(F.array_distinct("tok")).alias("term")
    ).join(F.broadcast(qterms), "term")
    return (
        hits.groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("n_terms"))
        .filter(F.col("n_terms") >= REL_MIN_TERMS)
        .select("query_id", "doc_id")
    )


def rank_eval_frame(docs: DataFrame) -> DataFrame:
    lists = (
        bm25_topk_frame(docs)
        .select("query_id", "doc_id", "rank", F.lit("bm25").alias("ranker"))
        .unionByName(
            ql_topk_frame(docs).select(
                "query_id", "doc_id", "rank", F.lit("ql").alias("ranker")
            )
        )
    )
    qrels = _qrels(docs)
    r_tot = qrels.groupBy("query_id").agg(
        F.count("*").cast("bigint").alias("r_total")
    )
    gains = F.lit(GAINS)
    marked = (
        lists.join(
            F.broadcast(qrels.withColumn("rel", F.lit(1))),
            ["query_id", "doc_id"],
            "left",
        )
        .join(F.broadcast(r_tot), "query_id", "left")
        .select(
            "ranker",
            "query_id",
            "rank",
            F.coalesce("rel", F.lit(0)).alias("rel"),
            F.coalesce("r_total", F.lit(0).cast("bigint")).alias("r_total"),
        )
        .withColumn("g", gains)
    )
    per_q = marked.groupBy("ranker", "query_id").agg(
        F.sum("rel").cast("bigint").alias("n_rel"),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_rel"),
        F.sum(
            F.expr("rel * element_at(g, cast(rank as int))")
        ).cast("bigint").alias("dcg_micro"),
        F.max("r_total").alias("r_total"),
    )
    idcg = (
        f"aggregate(slice(g2, 1, cast(least(r_total, {K}) as int)),"
        f" cast(0 as bigint), (a, v) -> a + v)"
    )
    return per_q.withColumn("g2", F.lit(GAINS)).select(
        "ranker",
        "query_id",
        "n_rel",
        F.expr(f"case when first_rel is null then 0"
               f" else {MICRO} div first_rel end")
        .cast("bigint")
        .alias("mrr_micro"),
        F.expr(
            f"case when r_total = 0 then cast(0 as bigint)"
            f" else cast(dcg_micro * {MICRO} div ({idcg}) as bigint) end"
        ).alias("ndcg_micro"),
    )


def rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return rank_eval_frame(docs)


_TOK = ("list_filter(string_split_regex(lower(text), '\\s+'),"
        " t -> length(t) > 0)")

_G_LIST = "[" + ", ".join(str(g) for g in GAINS) + "]"

RANK_EVAL_SQL = f"""
WITH base AS (SELECT doc_id, {_TOK} AS tok FROM documents),
qterms AS (
  SELECT DISTINCT doc_id AS query_id,
         unnest(list_filter(tok, (t, i) -> list_position(tok, t) = i)
                [1:{QUERY_TERMS}]) AS term
  FROM base WHERE doc_id % {QUERY_EVERY} = 0
),
qrels AS (
  SELECT query_id, doc_id
  FROM (SELECT q.query_id, x.doc_id, count(*) AS n_terms
        FROM (SELECT doc_id, unnest(list_distinct(tok)) AS term
              FROM base) x
        JOIN qterms q USING (term)
        GROUP BY 1, 2)
  WHERE n_terms >= {REL_MIN_TERMS}
),
r_tot AS (SELECT query_id, count(*)::BIGINT AS r_total
          FROM qrels GROUP BY 1),
lists AS (
  SELECT query_id, doc_id, rank, 'bm25' AS ranker FROM ({BM25_TOPK_SQL})
  UNION ALL
  SELECT query_id, doc_id, rank, 'ql' AS ranker FROM ({QL_TOPK_SQL})
),
marked AS (
  SELECT l.ranker, l.query_id, l.rank,
         CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END AS rel,
         coalesce(t.r_total, 0) AS r_total
  FROM lists l
  LEFT JOIN qrels r ON r.query_id = l.query_id AND r.doc_id = l.doc_id
  LEFT JOIN r_tot t ON t.query_id = l.query_id
),
per_q AS (
  SELECT ranker, query_id,
         sum(rel)::BIGINT AS n_rel,
         min(CASE WHEN rel = 1 THEN rank END) AS first_rel,
         sum(rel * ({_G_LIST})[rank])::BIGINT AS dcg_micro,
         max(r_total) AS r_total
  FROM marked GROUP BY 1, 2
)
SELECT ranker, query_id, n_rel,
       (CASE WHEN first_rel IS NULL THEN 0
             ELSE {MICRO} // first_rel END)::BIGINT AS mrr_micro,
       (CASE WHEN r_total = 0 THEN 0
             ELSE dcg_micro * {MICRO} //
                  list_sum(({_G_LIST})[1:least(r_total, {K})])
        END)::BIGINT AS ndcg_micro
FROM per_q
"""


QUERIES: dict[str, tuple] = {
    "search_rank_eval": (rank_eval, RANK_EVAL_SQL),
}
