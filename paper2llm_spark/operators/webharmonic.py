"""HyperBall harmonic centrality (Boldi & Vigna, "In-Core Computation
of Geometric Centralities with HyperBall", 2013) — the algorithm behind
Common Crawl's own published host-level ranking (their harmonic
centrality releases are computed with HyperBall over the host web
graph).  Exact all-pairs harmonic centrality is O(n·m); HyperBall
replaces each node's reachability ball with an HLL counter and grows
all balls one radius per round.

Frozen algorithm (deterministic; documented simplifications):

1. per node ONE initial register from its own 60-bit hash —
   ``bucket = h mod 16``, ``rho = 57 - bitlength(h div 16)`` (the
   ``websketch.py`` no-float-log formulation), capped at 24 so the
   estimator below stays in bigint (rank > 24 occurs w.p. 2^-24 per
   element; real HyperBall uses wider registers at 10^12 nodes,
   documented);
2. round r: every node's register set becomes the elementwise MAX of
   its own and its in-neighbours' sets — registers flow ALONG edge
   direction, so ball(v, r) counts nodes that can REACH v (the
   centrality Common Crawl ranks by); state is kept LONG as
   (node, bucket, rho) rows, so the merge is one map-side-combinable
   ``groupBy(node, bucket).max(rho)`` per round;
3. ball estimate per radius as an EXACT integer: the HLL harmonic
   denominator ``V = sum_j 2^-rho_j`` is scaled by 2^24 into the exact
   bigint ``S = sum_j 2^(24-rho_j)`` (absent registers contribute
   2^24), giving ``E_micro = (alpha_16 * 16^2 * 2^24 * 1e6) div S``
   with alpha_16 = 0.673 — no float is ever summed across rows (the
   raw-estimator form; HyperLogLog's small-range linear-counting
   correction is intentionally dropped, documented — the gate
   certifies the register pipeline and merge, accuracy is
   pytest-asserted separately);
4. harmonic centrality over ``R`` rounds:
   ``H_micro = sum_r (E_r - E_{r-1}) div r`` — registers only grow, so
   increments are non-negative and the integer division is identical
   in both engines.

Plan shape (the scale story): the edge list is checkpointed once; each
round shuffles (node, bucket, rho) SHORT rows through one
map-side-combinable groupBy — state is 16 bigints per node regardless
of graph size (HyperBall's entire point: harmonic centrality at 10^12
nodes without all-pairs anything); per-radius estimates are one
groupBy(node) each; the final assembly joins R+1 (node, bigint)
tables.  No Python, no driver-side state (plan-asserted).

Reference scope anchor: beyond-reference web-scale operator
(crawl-ranking tier); companions: `web_pagerank` / `web_hits_scores`
(webgraph.py), `web_trustrank` (webtrust.py), HLL registers
(websketch.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60
from .webgraph import PR_OUT_K, synth_edges

HB_M = 16          # registers per node
HB_ROUNDS = 3      # ball radius
HB_RHO_CAP = 24    # keeps S = sum 2^(cap-rho) in bigint
# alpha_16 * m^2 * 2^cap * 1e6 with alpha_16 = 0.673 exactly:
# 673 * 256 * 2^24 * 1000  (0.673 = 673/1000)
HB_EST_NUM = 673 * HB_M * HB_M * (1 << HB_RHO_CAP) * 1000


def _init_state(nodes: DataFrame) -> DataFrame:
    h = portable_hash60(
        F.concat(F.col("doc_id").cast("string"), F.lit(":hb")))
    w = F.expr(f"h div {HB_M}")
    rho = F.least(
        F.when(w == 0, F.lit(57)).otherwise(57 - F.length(F.bin(w))),
        F.lit(HB_RHO_CAP),
    )
    return nodes.select("doc_id", h.alias("h")).select(
        F.col("doc_id").alias("node"),
        (F.col("h") % HB_M).cast("bigint").alias("bucket"),
        rho.cast("bigint").alias("rho"),
    )


def _estimate(state: DataFrame, out: str) -> DataFrame:
    """(node, bucket, rho) -> (node, E_micro) via the exact-bigint
    scaled harmonic denominator."""
    per_reg = F.expr(f"shiftleft(cast(1 as bigint), "
                     f"cast({HB_RHO_CAP} - rho as int))")
    s = state.groupBy("node").agg(
        F.sum(per_reg).cast("bigint").alias("s_present"),
        F.count("*").cast("bigint").alias("n_present"),
    ).select(
        "node",
        (F.col("s_present")
         + (HB_M - F.col("n_present")) * (1 << HB_RHO_CAP))
        .alias("s_total"),
    )
    return s.select(
        "node", F.expr(f"{HB_EST_NUM} div s_total").alias(out))


def harmonic_frame(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(doc_id) nodes + (src, dst) edges -> per-node ball estimates at
    each radius and harmonic centrality, exact micro-units."""
    ed = edges.localCheckpoint()
    state = _init_state(nodes)
    ests = [_estimate(state, "e0")]
    for r in range(1, HB_ROUNDS + 1):
        contrib = ed.join(
            state.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "bucket", "rho")
        state = state.unionByName(contrib).groupBy(
            "node", "bucket"
        ).agg(F.max("rho").alias("rho"))
        ests.append(_estimate(state, f"e{r}"))
    merged = ests[0]
    for e in ests[1:]:
        merged = merged.join(e, "node")
    harm = " + ".join(
        f"(e{r} - e{r - 1}) div {r}" for r in range(1, HB_ROUNDS + 1)
    )
    return merged.select(
        F.col("node").alias("doc_id"),
        *[F.col(f"e{r}").alias(f"ball{r}_micro")
          for r in range(1, HB_ROUNDS + 1)],
        F.expr(f"cast({harm} as bigint)").alias("harmonic_micro"),
    )


def harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    n = nodes.count()
    return harmonic_frame(nodes, synth_edges(nodes, n))


def _harmonic_sql() -> str:
    he = sql_hash60("src || ':' || k")
    hn = sql_hash60("doc_id || ':hb'")
    ks = ", ".join(f"({k})" for k in range(PR_OUT_K))
    est = (
        f"SELECT node, ({HB_EST_NUM} // (sum((1::BIGINT <<"
        f" ({HB_RHO_CAP} - rho)))::BIGINT"
        f" + ({HB_M} - count(*)) * {1 << HB_RHO_CAP}))::BIGINT AS v"
        " FROM s{r} GROUP BY node"
    )
    ctes = [
        f"""n AS (SELECT count(*) AS n FROM documents),
e0_ AS (SELECT doc_id AS src, ({he}) % n.n AS dst
        FROM documents, n, (VALUES {ks}) t(k)),
e AS (SELECT DISTINCT src, dst FROM e0_ WHERE dst <> src),
s0 AS (SELECT doc_id AS node,
              (({hn}) % {HB_M})::BIGINT AS bucket,
              least(CASE WHEN ({hn}) // {HB_M} = 0 THEN 57
                    ELSE 57 - length(bin(({hn}) // {HB_M})) END,
                    {HB_RHO_CAP})::BIGINT AS rho
       FROM documents),
v0 AS ({est.format(r=0)})"""
    ]
    for r in range(1, HB_ROUNDS + 1):
        ctes.append(
            f"""s{r} AS (SELECT node, bucket, max(rho) AS rho FROM (
         SELECT node, bucket, rho FROM s{r - 1}
         UNION ALL
         SELECT e.dst AS node, s.bucket, s.rho
         FROM e JOIN s{r - 1} s ON s.node = e.src
       ) GROUP BY node, bucket),
v{r} AS ({est.format(r=r)})"""
        )
    harm = " + ".join(
        f"(v{r}.v - v{r - 1}.v) // {r}"
        for r in range(1, HB_ROUNDS + 1)
    )
    balls = ",\n       ".join(
        f"v{r}.v AS ball{r}_micro" for r in range(1, HB_ROUNDS + 1)
    )
    joins = "\n".join(
        f"JOIN v{r} ON v{r}.node = v0.node"
        for r in range(1, HB_ROUNDS + 1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT v0.node AS doc_id,
       {balls},
       ({harm})::BIGINT AS harmonic_micro
FROM v0
{joins}"""
    )


HARMONIC_SQL = _harmonic_sql()


QUERIES: dict[str, tuple] = {
    "web_harmonic_centrality": (harmonic_centrality, HARMONIC_SQL),
}
