"""Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty,
SIGIR 2001) and reciprocal-rank fusion of the two lexical rankers
(Cormack, Clarke & Buettcher, SIGIR 2009).  QL is the language-model
ranker that sits beside BM25 in every IR baseline table; RRF is how
production search actually combines rankers (and how RAG stacks fuse
lexical with dense retrieval) — rank-only, score-scale-free, and
robust to either system's calibration.

Semantics (frozen): workload and candidate rule mirror websearch.py
exactly (queries = first 3 distinct tokens of every 41st doc;
candidates = docs matching >= 1 query term).  QL with ``MU = 2000``:
every (candidate doc, query term) pair — INCLUDING zero-tf pairs,
the LM property BM25 lacks — scores the textbook
``ln((tf*T + MU*cf) / (T*(dl + MU)))`` as ONE shape-identical double
``ln`` over exact integer products, floored to micro-nats; sums are
exact bigints; top-10 per query (score desc, doc_id asc).  RRF with
``RRF_K = 60``: over the BM25 and QL top-10 lists,
``rrf = sum 1e6 div (60 + rank)`` — FULLY exact integers, no floats
at all — docs on one list only get that list's term (the paper's
rule); top-10 by (rrf desc, doc_id asc).

Plan shape (the scale story): QL adds ONE structure to the BM25
dataflow — the (candidate-doc x query-term) densification is a
candidate-bounded left join against the postings (|cands| * 3 rows,
never corpus-sized), with cf re-entering by broadcast exactly like
df does in BM25.  RRF consumes two K-bounded rank lists (|queries| *
10 rows each) — union + groupBy + one window; at any corpus scale the
fusion input is already tiny by construction.  Zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from .websearch import (
    BM25_TOPK_SQL, K, QUERY_EVERY, QUERY_TERMS, bm25_topk_frame,
)

MU = 2000
RRF_K = 60


def ql_topk_frame(docs: DataFrame) -> DataFrame:
    base = docs.select(
        "doc_id", tokens(F.col("text")).alias("tok")
    ).select(
        "doc_id", "tok", F.size("tok").cast("bigint").alias("dl")
    )
    postings = base.select(
        "doc_id", "dl", F.explode("tok").alias("term")
    ).groupBy("doc_id", "term").agg(
        F.count("*").cast("bigint").alias("tf"),
        F.min("dl").alias("dl"),
    )
    scalars = base.agg(
        F.sum("dl").cast("bigint").alias("t_tokens"),
    )
    qterms = base.filter(F.col("doc_id") % QUERY_EVERY == 0).select(
        F.col("doc_id").alias("query_id"),
        F.explode(
            F.slice(F.array_distinct("tok"), 1, QUERY_TERMS)
        ).alias("term"),
    ).distinct()
    cf_tbl = (
        postings.join(
            F.broadcast(qterms.select("term").distinct()), "term"
        )
        .groupBy("term")
        .agg(F.sum("tf").cast("bigint").alias("cf"))
    )
    cands = (
        postings.join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id", "dl")
        .distinct()
    )
    dense = (
        cands.join(F.broadcast(qterms), "query_id")
        .join(
            postings.select("doc_id", "term", "tf"),
            ["doc_id", "term"], "left",
        )
        .join(F.broadcast(cf_tbl), "term")
        .crossJoin(F.broadcast(scalars))
    )
    per_doc = dense.select(
        "query_id", "doc_id",
        F.expr(
            f"cast(floor(ln((coalesce(tf, 0) * t_tokens + {MU} * cf)"
            f" / (t_tokens * (dl + {MU}))) * 1e6 + 0.5) as bigint)"
        ).alias("s"),
    ).groupBy("query_id", "doc_id").agg(
        F.sum("s").cast("bigint").alias("score_micro")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    )
    return per_doc.select(
        "query_id",
        F.row_number().over(w).cast("bigint").alias("rank"),
        "doc_id", "score_micro",
    ).filter(F.col("rank") <= K)


def ql_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return ql_topk_frame(docs)


def rrf_frame(docs: DataFrame) -> DataFrame:
    lists = bm25_topk_frame(docs).select(
        "query_id", "doc_id", "rank"
    ).unionByName(
        ql_topk_frame(docs).select("query_id", "doc_id", "rank")
    )
    fused = lists.groupBy("query_id", "doc_id").agg(
        F.sum(
            F.expr(f"1000000 div ({RRF_K} + rank)")
        ).cast("bigint").alias("rrf_micro"),
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micro").desc(), F.col("doc_id").asc()
    )
    return fused.select(
        "query_id",
        F.row_number().over(w).cast("bigint").alias("rank"),
        "doc_id", "rrf_micro", "n_lists",
    ).filter(F.col("rank") <= K)


def rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return rrf_frame(docs)


_TOK = ("list_filter(string_split_regex(lower(text), '\\s+'),"
        " t -> length(t) > 0)")

QL_TOPK_SQL = f"""
WITH base AS (
  SELECT doc_id, {_TOK} AS tok, len({_TOK})::BIGINT AS dl FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf, min(dl) AS dl
  FROM (SELECT doc_id, dl, unnest(tok) AS term FROM base)
  GROUP BY doc_id, term
),
scalars AS (SELECT sum(dl)::BIGINT AS t_tokens FROM base),
qterms AS (
  SELECT DISTINCT doc_id AS query_id,
         unnest(list_filter(tok, (t, i) -> list_position(tok, t) = i)
                [1:{QUERY_TERMS}]) AS term
  FROM base WHERE doc_id % {QUERY_EVERY} = 0
),
cf_tbl AS (
  SELECT term, sum(tf)::BIGINT AS cf FROM postings
  WHERE term IN (SELECT term FROM qterms) GROUP BY 1
),
cands AS (
  SELECT DISTINCT q.query_id, p.doc_id, p.dl
  FROM postings p JOIN qterms q USING (term)
),
per_doc AS (
  SELECT c.query_id, c.doc_id,
         sum(floor(ln((coalesce(p.tf, 0) * t_tokens + {MU} * f.cf)
                      / (t_tokens * (c.dl + {MU}))) * 1e6 + 0.5)::BIGINT
            )::BIGINT AS score_micro
  FROM cands c
  JOIN qterms q USING (query_id)
  LEFT JOIN postings p ON p.doc_id = c.doc_id AND p.term = q.term
  JOIN cf_tbl f ON f.term = q.term, scalars
  GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, score_micro
FROM (
  SELECT query_id, doc_id, score_micro,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_micro DESC, doc_id)::BIGINT
           AS rank
  FROM per_doc
)
WHERE rank <= {K}
"""

RRF_SQL = f"""
WITH b AS (SELECT * FROM ({BM25_TOPK_SQL})),
q AS (SELECT * FROM ({QL_TOPK_SQL})),
u AS (
  SELECT query_id, doc_id, rank FROM b
  UNION ALL SELECT query_id, doc_id, rank FROM q
),
fused AS (
  SELECT query_id, doc_id,
         sum(1000000 // ({RRF_K} + rank))::BIGINT AS rrf_micro,
         count(*)::BIGINT AS n_lists
  FROM u GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, rrf_micro, n_lists
FROM (
  SELECT query_id, doc_id, rrf_micro, n_lists,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf_micro DESC, doc_id)::BIGINT
           AS rank
  FROM fused
)
WHERE rank <= {K}
"""


QUERIES: dict[str, tuple] = {
    "search_ql_topk": (ql_topk, QL_TOPK_SQL),
    "search_rrf_fusion": (rrf_fusion, RRF_SQL),
}
