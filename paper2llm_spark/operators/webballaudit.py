"""HyperBall estimator audit — exact in-reachability balls vs the
HLL ball estimates (Boldi & Vigna WSDM 2011 validate HyperBall
exactly this way: exact neighbourhood functions on a graph small
enough to afford them, then trust the sketch at scale; the graph
member of the audit family beside `sketch_minhash_error` and
`ann_recall_audit`).

Composes `web_harmonic_centrality` verbatim (the registered
HyperBall rounds — registers, merge, exact-integer estimator — are
re-certified under this row) and computes the EXACT ball sizes at
radius 1 and 2 by plain joins over the same deterministic graph.

Semantics (frozen): registers flow ALONG edges, so
``ball(v, r)`` counts nodes that can REACH v in <= r hops
(including v).  Exact sets by distinct member accumulation
(radius-2 members = {v} ∪ in(v) ∪ in(in(v))).  Output per node:
``exact1, exact2, est1_micro, est2_micro`` (the composed
estimates) and ``err{r}_micro = abs(est - exact*1e6) div exact``
— the relative error ledger.  The registered estimator
deliberately omits HLL's small-range linear-counting correction
(documented there), so small balls show the raw-estimator bias —
this audit is the table that QUANTIFIES that documented choice.

Plan shape (the scale story): exact neighbourhood functions are
O(sum deg^r) — affordable on the fixture/sample, which is exactly
how HyperBall itself was validated; at 10^12 nodes only the sketch
runs and this audit runs on a sampled subgraph (documented).  The
audit's own joins are short-row (node, member) equi-joins on the
checkpointed edge list; zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import sql_hash60
from .webgraph import PR_OUT_K, synth_edges
from .webharmonic import HARMONIC_SQL, harmonic_frame

MICRO = 1_000_000


def ball_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    n = nodes.count()
    edges = synth_edges(nodes, n).localCheckpoint()
    est = harmonic_frame(nodes, edges).select(
        "doc_id",
        F.col("ball1_micro").alias("est1_micro"),
        F.col("ball2_micro").alias("est2_micro"),
    )
    self_m = nodes.select(
        F.col("doc_id").alias("node"), F.col("doc_id").alias("member")
    )
    r1 = self_m.unionByName(
        edges.select(F.col("dst").alias("node"), F.col("src").alias("member"))
    ).distinct()
    hop2 = (
        edges.select(F.col("dst").alias("node"), F.col("src").alias("mid"))
        .join(
            edges.select(
                F.col("dst").alias("mid"), F.col("src").alias("member")
            ),
            "mid",
        )
        .select("node", "member")
    )
    r2 = r1.unionByName(hop2).distinct()
    exact = (
        r1.groupBy("node").agg(F.count("*").cast("bigint").alias("exact1"))
        .join(
            r2.groupBy("node").agg(
                F.count("*").cast("bigint").alias("exact2")
            ),
            "node",
        )
        .withColumnRenamed("node", "doc_id")
    )
    return est.join(exact, "doc_id").select(
        "doc_id",
        "exact1",
        "exact2",
        "est1_micro",
        "est2_micro",
        F.expr(f"abs(est1_micro - exact1 * {MICRO}) div exact1")
        .cast("bigint").alias("err1_micro"),
        F.expr(f"abs(est2_micro - exact2 * {MICRO}) div exact2")
        .cast("bigint").alias("err2_micro"),
    )


def _audit_sql() -> str:
    he = sql_hash60("src || ':' || k")
    ks = ", ".join(f"({k})" for k in range(PR_OUT_K))
    return f"""
WITH est AS (
  SELECT doc_id, ball1_micro AS est1_micro, ball2_micro AS est2_micro
  FROM ({HARMONIC_SQL})
),
n AS (SELECT count(*) AS n FROM documents),
e0_ AS (SELECT doc_id AS src, ({he}) % n.n AS dst
        FROM documents, n, (VALUES {ks}) t(k)),
e AS (SELECT DISTINCT src, dst FROM e0_ WHERE dst <> src),
r1 AS (
  SELECT DISTINCT node, member FROM (
    SELECT doc_id AS node, doc_id AS member FROM documents
    UNION ALL
    SELECT dst, src FROM e
  )
),
hop2 AS (
  SELECT a.dst AS node, b.src AS member
  FROM e a JOIN e b ON b.dst = a.src
),
r2 AS (
  SELECT DISTINCT node, member FROM (
    SELECT node, member FROM r1
    UNION ALL
    SELECT node, member FROM hop2
  )
),
exact AS (
  SELECT x1.node AS doc_id, x1.exact1, x2.exact2
  FROM (SELECT node, count(*)::BIGINT AS exact1 FROM r1 GROUP BY 1) x1
  JOIN (SELECT node, count(*)::BIGINT AS exact2 FROM r2 GROUP BY 1) x2
    USING (node)
)
SELECT est.doc_id, exact.exact1, exact.exact2,
       est.est1_micro, est.est2_micro,
       (abs(est.est1_micro - exact.exact1 * {MICRO})
        // exact.exact1)::BIGINT AS err1_micro,
       (abs(est.est2_micro - exact.exact2 * {MICRO})
        // exact.exact2)::BIGINT AS err2_micro
FROM est JOIN exact ON exact.doc_id = est.doc_id
"""


BALL_AUDIT_SQL = _audit_sql()


QUERIES: dict[str, tuple] = {
    "web_hyperball_audit": (ball_audit, BALL_AUDIT_SQL),
}
