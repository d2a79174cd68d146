"""BM25 top-k retrieval (Robertson et al., Okapi BM25) — the
inverted-index search shape a corpus-curation stack uses for
eval-set retrieval, nearest-neighbour text lookup and contamination
forensics.

Exactness: with the standard constants k1 = 6/5 and b = 3/4 the whole
per-term score is RATIONAL given integer tf, dl, df, N and total token
count T::

    score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
          = idf_micro * tf * 44 * T  DIV  (20*T*tf + 6*T + 18*dl*N)

(avgdl = T/N substituted and cleared).  Two floats remain, both
shape-identical in the two engines: the ln inside idf — routed through
the repo's exact micro-nat convention (identical double SHAPE, then
floor(x*1e6+0.5)), ``idf_micro = ln((2N - 2df + 1) / (2df + 1))`` (the
+0.5-smoothed Robertson idf with numerator/denominator doubled to stay
integral) — and the per-term score itself, which is ``floor()`` of a
DOUBLE division, not a true integer DIV: the integer products reach
~1e16-1e17 (> 2^53) so the quotient is double-rounded, identically in
both engines because the expression shape is identical.  A true
bigint DIV would remove that rounding but overflows int64 once
``idf_micro * tf * 44 * T`` passes 9.2e18 (already reachable at
corpus-scale T), so the double form is the deliberate choice — any
"cleanup" to integer DIV on one side only would break the cross-engine
hash.

Plan shape (the scale story):

* ``dl`` is computed scan-side; the ONE corpus-sized exchange is the
  map-side-combinable ``groupBy(doc_id, term)`` building the postings
  (tf) table — the inverted index;
* the query-term table (a few dozen rows, synthesized from the corpus)
  **broadcasts** onto the postings, so only postings of query terms
  survive as candidates;
* df and the (N, T) corpus scalars collapse to tiny aggregates that
  re-enter by broadcast (1-row crossJoin — the HITS normalization
  pattern, never a driver collect);
* per-query top-k is a TWO-LEVEL tournament: row_number within
  (query_id, 64-way doc-hash shard) keeps k rows per shard, then the
  global per-query window ranks <= 64k survivors — exact, and no
  single window partition ever sees the full candidate set (a direct
  per-query window would put 10^12 rows in Q partitions at crawl
  scale).  Ties break (score desc, doc_id asc): all-integer, so both
  engines agree.

Queries are synthesized deterministically from the corpus (first 3
distinct tokens of every 41st document), so the operator needs no
external data and the DuckDB dual plants the identical workload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens

K = 10          # results per query
SHARDS = 64     # first-level tournament width
QUERY_EVERY = 41  # every 41st doc seeds a query
QUERY_TERMS = 3


def bm25_topk_frame(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text) -> (query_id, rank, doc_id, score_micro)."""
    # tokenization recomputes per consumer (3 pruned scans) — at crawl
    # scale that beats materializing the tokenized corpus
    base = docs.select(
        "doc_id", tokens(F.col("text")).alias("tok")
    ).select(
        "doc_id", "tok", F.size("tok").cast("bigint").alias("dl")
    )

    # inverted index: (term, doc_id, tf, dl) — the one corpus exchange
    postings = base.select(
        "doc_id", "dl", F.explode("tok").alias("term")
    ).groupBy("doc_id", "term").agg(
        F.count("*").cast("bigint").alias("tf"),
        F.min("dl").alias("dl"),
    )

    # corpus scalars: N docs, T total tokens (scan-side collapse)
    scalars = base.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("t_tokens"),
    )

    # deterministic query workload from the corpus itself
    qterms = base.filter(F.col("doc_id") % QUERY_EVERY == 0).select(
        F.col("doc_id").alias("query_id"),
        F.explode(
            F.slice(F.array_distinct("tok"), 1, QUERY_TERMS)
        ).alias("term"),
    ).distinct()

    cand = postings.join(F.broadcast(qterms), "term")
    df_tbl = cand.select("term", "doc_id").distinct().groupBy("term").agg(
        F.count("*").cast("bigint").alias("df")
    )
    scored = cand.join(F.broadcast(df_tbl), "term").crossJoin(
        F.broadcast(scalars)
    )

    n, t = F.col("n_docs"), F.col("t_tokens")
    idf_micro = F.floor(
        F.log((2 * n - 2 * F.col("df") + 1) / (2 * F.col("df") + 1))
        * 1e6 + F.lit(0.5)
    ).cast("bigint")
    tf, dl = F.col("tf"), F.col("dl")
    term_score = (idf_micro * tf * 44 * t) / (20 * t * tf + 6 * t + 18 * dl * n)
    per_doc = scored.select(
        "query_id", "doc_id",
        F.floor(term_score).cast("bigint").alias("s"),
    ).groupBy("query_id", "doc_id").agg(
        F.sum("s").cast("bigint").alias("score_micro")
    )

    # two-level exact top-k
    order = [F.col("score_micro").desc(), F.col("doc_id").asc()]
    shard_w = Window.partitionBy(
        "query_id", F.pmod(F.xxhash64("doc_id"), F.lit(SHARDS))
    ).orderBy(*order)
    survivors = per_doc.withColumn(
        "r", F.row_number().over(shard_w)
    ).filter(F.col("r") <= K).drop("r")
    final_w = Window.partitionBy("query_id").orderBy(*order)
    return survivors.select(
        "query_id",
        F.row_number().over(final_w).cast("bigint").alias("rank"),
        "doc_id", "score_micro",
    ).filter(F.col("rank") <= K)


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return bm25_topk_frame(docs)


_TOK = "list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0)"

BM25_TOPK_SQL = f"""
WITH base AS (
  SELECT doc_id, {_TOK} AS tok, len({_TOK})::BIGINT AS dl FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf, min(dl) AS dl
  FROM (SELECT doc_id, dl, unnest(tok) AS term FROM base)
  GROUP BY doc_id, term
),
scalars AS (
  SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS t_tokens FROM base
),
qterms AS (
  -- list_distinct does NOT preserve order; Spark's array_distinct keeps
  -- first occurrence, so mirror that explicitly
  SELECT DISTINCT doc_id AS query_id,
         unnest(list_filter(tok, (t, i) -> list_position(tok, t) = i)[1:{QUERY_TERMS}]) AS term
  FROM base WHERE doc_id % {QUERY_EVERY} = 0
),
cand AS (
  SELECT q.query_id, p.doc_id, p.term, p.tf, p.dl
  FROM postings p JOIN qterms q USING (term)
),
df_tbl AS (
  SELECT term, count(*)::BIGINT AS df
  FROM (SELECT DISTINCT term, doc_id FROM cand) GROUP BY term
),
per_doc AS (
  SELECT query_id, doc_id,
         sum(floor((floor(ln((2*n_docs - 2*df + 1) / (2*df + 1)) * 1e6 + 0.5)::BIGINT
                    * tf * 44 * t_tokens)
                   / (20*t_tokens*tf + 6*t_tokens + 18*dl*n_docs))::BIGINT
            )::BIGINT AS score_micro
  FROM cand JOIN df_tbl USING (term), scalars
  GROUP BY query_id, doc_id
)
SELECT query_id, rank, doc_id, score_micro
FROM (
  SELECT query_id, doc_id, score_micro,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_micro DESC, doc_id)::BIGINT AS rank
  FROM per_doc
)
WHERE rank <= {K}
"""


QUERIES: dict[str, tuple] = {
    "search_bm25_topk": (bm25_topk, BM25_TOPK_SQL),
}
