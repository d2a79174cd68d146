"""OPIC — On-line Page Importance Computation (Abiteboul, Preda &
Cobena, WWW 2003) — the crawl-ordering importance estimate Nutch
ships as its default scoring plugin.

The model: every page holds CASH; when a page is "crawled" it
distributes its cash equally over its outlinks and its HISTORY
records the total cash that has flowed through it.  Importance is
proportional to history — like PageRank, but computable online while
the crawl runs, with no convergence phase before scores are usable.
This implementation runs the synchronous batch variant: every round,
every page distributes.

Semantics (frozen, exact bigint micro-units): cash starts at
1_000_000 per node, history at 0.  Per round, a node with out-degree
``d > 0`` sends ``cash div d`` along each edge and RETAINS the
integer remainder ``cash mod d`` (exact conservation — no float mass
leaks; the remainder re-enters next round).  Dangling nodes (planted:
``doc_id % 17 == 0`` has its outlinks dropped — ~6% of the corpus, so
the virtual-node path is exercised, not vacuous) send ALL cash to the
paper's VIRTUAL page, which redistributes ``v div n`` to every node
next round and carries ``v mod n`` forward.  History grows by exactly
the amount distributed.  Total cash is conserved to the unit:
``sum(cash) + virtual == n * 1_000_000`` every round (pytest-locked).
Output after OPIC_ITERS rounds: ``(doc_id, cash_micro, hist_micro)``.

Plan shape (the scale story): identical skeleton to this repo's
PageRank (webgraph.py) — the edge list with out-degree attached is
materialized ONCE (localCheckpoint); each round shuffles only
``(dst, bigint)`` contribution rows through one map-side-combinable
groupBy; the virtual node and the dangling-cash sum are 1-ROW frames
that re-enter by broadcast crossJoin (the HITS max-normalization
discipline — never a driver collect).  At 10^12 pages each round is
one co-located equi-join plus one short-row aggregate; the virtual
node costs one scalar broadcast.  The online/incremental variant the
paper actually deploys (crawl order, adaptive windows) changes WHEN
pages distribute, not the per-round dataflow shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import sql_hash60
from .webgraph import PR_OUT_K, _nodes, synth_edges

OPIC_ITERS = 3
OPIC_INIT = 1_000_000
DANGLE_MOD = 17  # doc_id % 17 == 0 -> outlinks dropped (planted dangling)


def _opic_edges(nodes: DataFrame, n_nodes: int) -> DataFrame:
    return synth_edges(nodes, n_nodes).filter(
        F.col("src") % DANGLE_MOD != 0
    )


def opic_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = _nodes(spark, sf_dir)
    n = nodes.count()
    return opic_frame(spark, nodes, _opic_edges(nodes, n), n)


def opic_frame(
    spark: SparkSession, nodes: DataFrame, edges: DataFrame, n: int
) -> DataFrame:
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = edges.join(deg, "src").localCheckpoint()

    state = nodes.select(
        "doc_id",
        F.lit(OPIC_INIT).cast("bigint").alias("cash"),
        F.lit(0).cast("bigint").alias("hist"),
    )
    vrow = spark.range(1).select(F.lit(0).cast("bigint").alias("v"))

    for _ in range(OPIC_ITERS):
        st = state.join(
            deg.withColumnRenamed("src", "doc_id"), "doc_id", "left"
        )
        incoming = (
            ed.join(
                state.select(F.col("doc_id").alias("src"), "cash"), "src"
            )
            .select("dst", F.expr("cash div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .withColumnRenamed("dst", "doc_id")
        )
        dangle = st.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("cash"), F.lit(0)).cast("bigint").alias("dang")
        )
        state = (
            st.join(incoming, "doc_id", "left")
            .crossJoin(F.broadcast(vrow))
            .select(
                "doc_id",
                (
                    F.coalesce(F.col("s"), F.lit(0))
                    + F.when(
                        F.col("deg").isNull(), F.lit(0)
                    ).otherwise(F.expr("cash % deg"))
                    + F.expr(f"v div {n}")
                )
                .cast("bigint")
                .alias("cash"),
                (
                    F.col("hist")
                    + F.when(F.col("deg").isNull(), F.col("cash")).otherwise(
                        F.expr("cash - cash % deg")
                    )
                )
                .cast("bigint")
                .alias("hist"),
            )
        )
        vrow = (
            dangle.crossJoin(F.broadcast(vrow))
            .select(
                (F.col("dang") + F.expr(f"v % {n}")).cast("bigint").alias("v")
            )
        )
        # pin each round's state: without this the round-i plan re-executes
        # rounds 1..i-1 once per downstream branch (state feeds incoming,
        # dangle AND the new state; vrow feeds two places) — the standard
        # iterative-algorithm cut, same as webgraph's edge checkpoint
        state = state.localCheckpoint()
        vrow = vrow.localCheckpoint()

    return state.select(
        "doc_id",
        F.col("cash").alias("cash_micro"),
        F.col("hist").alias("hist_micro"),
    )


def _opic_sql() -> str:
    h = sql_hash60("src || ':' || k")
    ks = ", ".join(f"({k})" for k in range(PR_OUT_K))
    ctes = [
        f"""n AS (SELECT count(*) AS n FROM documents),
e0 AS (SELECT doc_id AS src, ({h}) % n.n AS dst
       FROM documents, n, (VALUES {ks}) t(k)),
e AS (SELECT DISTINCT src, dst FROM e0
      WHERE dst <> src AND src % {DANGLE_MOD} <> 0),
deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
s0 AS (SELECT doc_id, {OPIC_INIT}::BIGINT AS cash, 0::BIGINT AS hist
       FROM documents),
v0 AS (SELECT 0::BIGINT AS v)"""
    ]
    for i in range(1, OPIC_ITERS + 1):
        p = i - 1
        ctes.append(
            f"""st{i} AS (SELECT s.doc_id, s.cash, s.hist, d.deg
        FROM s{p} s LEFT JOIN deg d ON d.src = s.doc_id),
inc{i} AS (SELECT e.dst, sum(st.cash // st.deg)::BIGINT AS s
        FROM e JOIN st{i} st ON st.doc_id = e.src
        GROUP BY e.dst),
dang{i} AS (SELECT coalesce(sum(cash), 0)::BIGINT AS dang
        FROM st{i} WHERE deg IS NULL),
s{i} AS (SELECT st.doc_id,
        (coalesce(inc.s, 0)
         + CASE WHEN st.deg IS NULL THEN 0 ELSE st.cash % st.deg END
         + (SELECT v FROM v{p}) // n.n)::BIGINT AS cash,
        (st.hist
         + CASE WHEN st.deg IS NULL THEN st.cash
                ELSE st.cash - st.cash % st.deg END)::BIGINT AS hist
        FROM st{i} st LEFT JOIN inc{i} inc ON inc.dst = st.doc_id, n),
v{i} AS (SELECT ((SELECT dang FROM dang{i})
         + (SELECT v FROM v{p}) % n.n)::BIGINT AS v FROM n)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT doc_id, cash AS cash_micro, hist AS hist_micro"
        f" FROM s{OPIC_ITERS}"
    )


OPIC_SQL = _opic_sql()


QUERIES: dict[str, tuple] = {
    "web_opic_scores": (opic_scores, OPIC_SQL),
}
