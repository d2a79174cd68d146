"""ANN recall audit — recall@K of the approximate indexes against
the exhaustive baseline (THE metric of the ANN literature: every
ann-benchmarks curve, Jégou et al. TPAMI 2011 Table 2, the
IVF/PQ/HNSW papers all report recall@K vs the brute-force truth).
The repo ships three retrieval families (`ann_cosine_topk` exact,
`ann_ivf_topk` pruned, `ann_pq_topk` compressed) — this operator is
the table that says what the pruning and the compression each cost
in recall, per query and per method.

Composes all three registered queries verbatim; a green row
transitively re-certifies the exact ranker AND both approximations
under one driver hash.

Semantics (frozen): truth = the exact top-``TOPK`` neighbor set per
query; per (method, query): ``hits`` = |approx top-K ∩ truth|,
``recall_micro = hits * 1e6 div TOPK``.  IVF can miss queries whose
cell holds no other vector (no output row -> recall 0 row is still
emitted via the query universe — the honest accounting).

Plan shape (the scale story): the composed rankers do the real
work; the audit joins K-bounded rank lists (|queries| x K rows per
method) — truth re-enters by BROADCAST, the groupBy collapses
|methods| x |queries| cells.  Nothing corpus-sized moves in the
audit itself; zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import N_QUERIES, TOPK, _emb, cosine_topk, ivf_topk, pq_topk

MICRO = 1_000_000


def ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    truth = cosine_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    approx = (
        ivf_topk(spark, sf_dir)
        .select("query_id", "neighbor_id", F.lit("ivf").alias("method"))
        .unionByName(
            pq_topk(spark, sf_dir).select(
                "query_id", "neighbor_id", F.lit("pq").alias("method")
            )
        )
    )
    hits = (
        approx.join(F.broadcast(truth), ["query_id", "neighbor_id"])
        .groupBy("method", "query_id")
        .agg(F.count("*").cast("bigint").alias("hits"))
    )
    universe = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"))
        .crossJoin(
            spark.createDataFrame(
                [("ivf",), ("pq",)], "method string"
            )
        )
    )
    return (
        universe.join(F.broadcast(hits), ["method", "query_id"], "left")
        .select(
            "method",
            "query_id",
            F.coalesce("hits", F.lit(0)).cast("bigint").alias("hits"),
            F.expr(f"coalesce(hits, 0) * {MICRO} div {TOPK}")
            .cast("bigint")
            .alias("recall_micro"),
        )
    )


def _recall_sql() -> str:
    from .similarity import COSINE_TOPK_SQL, IVF_TOPK_SQL, PQ_TOPK_SQL

    return f"""
WITH truth AS (SELECT query_id, neighbor_id FROM ({COSINE_TOPK_SQL})),
approx AS (
  SELECT query_id, neighbor_id, 'ivf' AS method FROM ({IVF_TOPK_SQL})
  UNION ALL
  SELECT query_id, neighbor_id, 'pq' AS method FROM ({PQ_TOPK_SQL})
),
hits AS (
  SELECT method, query_id, count(*)::BIGINT AS hits
  FROM approx JOIN truth USING (query_id, neighbor_id)
  GROUP BY 1, 2
),
universe AS (
  SELECT vec_id AS query_id, m.method
  FROM embeddings, (SELECT unnest(['ivf', 'pq']) AS method) m
  WHERE vec_id < {N_QUERIES}
)
SELECT u.method, u.query_id,
       coalesce(h.hits, 0)::BIGINT AS hits,
       (coalesce(h.hits, 0) * {MICRO} // {TOPK})::BIGINT AS recall_micro
FROM universe u LEFT JOIN hits h USING (method, query_id)
"""


ANN_RECALL_SQL = _recall_sql()


QUERIES: dict[str, tuple] = {
    "ann_recall_audit": (ann_recall, ANN_RECALL_SQL),
}
