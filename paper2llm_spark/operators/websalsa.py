"""SALSA authority scores (Lempel & Moran, WWW 2000, "The stochastic
approach for link-structure analysis") — the link-analysis alternative
to HITS that search stacks run because it resists the Tightly-Knit
Community effect: instead of mutual reinforcement, score a page by the
stationary distribution of a random walk that alternates one step
backward (authority -> some hub linking to it) and one step forward
(hub -> some authority it links to).

The paper's central result makes this EXACTLY computable with no
iteration at all: within each connected component of the authority-side
support graph (authorities adjacent iff some hub links to both), the
stationary probability of authority ``i`` is proportional to its
in-degree, and each component carries weight proportional to its node
count.  So

    auth(i) = (|C_i| / |A|) * (in_deg(i) / sum_{k in C_i} in_deg(k))

which in exact micro-units is the single bigint expression

    auth_micro = (|C_i| * in_deg(i) * 1e6) div (|A| * S_{C_i}).

(The hub side is the mirror statement on out-degrees over the hub
support graph; this operator materializes the authority side — the
anti-TKC ranking the paper is cited for.)

Magnitude: ``|C| * in_deg * 1e6`` stays under 2^63 while
``|C| * in_deg < 9.2e12`` — comfortably true for host-level graphs and
for doc-level graphs with bounded in-degree; past that, production
reduces the ratio ``|C|/|A|`` first (both are component-level scalars),
documented here rather than hidden.

Plan shape (the scale story): the graph is deterministic hash-derived
edges over BLOCKED id ranges (``dst = block_start(src) + h % G``) so
the component structure is non-trivial — at least ``n/G`` components by
construction, exercising the per-component normalization with both
polarities (multi-node components AND hub-out-degree-1 singletons).
The authority support graph is built WITHOUT the quadratic "all pairs
sharing a hub" expansion: per hub, its (<= PR_OUT_K) sorted targets are
chained via one ``lag()`` window (consecutive pairs connect exactly the
same components as the full clique, at k-1 edges instead of C(k,2)) —
one hashpartitioning(src) exchange.  Components come from
``dedup.connected_components`` (min-label + pointer doubling, O(log
diameter) rounds).  Degree counts, component sums and the |A| scalar
are all map-side-combinable aggs; |A| re-enters as a 1-row broadcast
crossJoin (the HITS normalization pattern — never a driver collect).

Reference scope anchor: beyond-reference web-scale operator
(link-analysis tier); completes the graph family `web_pagerank` /
`web_hits_scores` / `web_trustrank` / `web_harmonic_centrality`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60
from .dedup import connected_components

SALSA_G = 25      # id-block size: components cannot cross blocks
SALSA_OUT_K = 3   # hash-chosen targets per hub (same K as webgraph)
MICRO = 1_000_000


def _blocked_edges(nodes: DataFrame) -> DataFrame:
    """Deterministic (src, dst) edges confined to ``SALSA_G``-sized id
    blocks: ``dst = (src div G) * G + h(src:k) % G``, self-loops
    dropped, duplicates collapsed."""
    ks = F.array(*[F.lit(k) for k in range(SALSA_OUT_K)])
    h = portable_hash60(
        F.concat(F.col("src").cast("string"), F.lit(":"),
                 F.col("k").cast("string"))
    )
    return (
        nodes.select(F.col("doc_id").alias("src"), F.explode(ks).alias("k"))
        .select(
            "src",
            (F.expr(f"src div {SALSA_G}") * SALSA_G
             + (h % SALSA_G)).alias("dst"),
        )
        .filter(F.col("dst") != F.col("src"))
        .distinct()
    )


def salsa_frame(nodes: DataFrame) -> DataFrame:
    """doc_id nodes -> one row per authority (a linked-to id) with its
    support-graph component, in-degree and exact SALSA authority score
    in micro-units."""
    e = _blocked_edges(nodes).localCheckpoint()
    # authority support graph: consecutive sorted targets per hub
    # (same connectivity as the shared-hub clique, linear edge count)
    w = Window.partitionBy("src").orderBy("dst")
    chain = (
        e.withColumn("prev", F.lag("dst").over(w))
        .filter(F.col("prev").isNotNull())
        .select(F.col("prev").alias("src"), F.col("dst"))
    )
    comp = connected_components(chain)
    auth = e.groupBy(F.col("dst").alias("auth_id")).agg(
        F.count("*").cast("bigint").alias("in_deg")
    )
    labeled = auth.join(
        comp, auth.auth_id == comp.node, "left"
    ).select(
        "auth_id", "in_deg",
        F.coalesce("cluster", F.col("auth_id")).alias("component"),
    )
    sums = labeled.groupBy("component").agg(
        F.sum("in_deg").cast("bigint").alias("comp_indeg"),
        F.count("*").cast("bigint").alias("comp_nodes"),
    )
    total = labeled.agg(F.count("*").cast("bigint").alias("n_auth"))
    return (
        labeled.join(sums, "component")
        .crossJoin(F.broadcast(total))
        .select(
            "auth_id", "component", "in_deg", "comp_nodes",
            F.expr(
                f"(comp_nodes * in_deg * {MICRO})"
                " div (n_auth * comp_indeg)"
            ).cast("bigint").alias("auth_micro"),
        )
    )


def salsa_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    return salsa_frame(nodes)


def _salsa_sql() -> str:
    h = sql_hash60("src || ':' || k")
    ks = ", ".join(f"({k})" for k in range(SALSA_OUT_K))
    return f"""
WITH RECURSIVE e0 AS (
  SELECT src, (src // {SALSA_G}) * {SALSA_G} + ({h}) % {SALSA_G} AS dst
  FROM (SELECT doc_id AS src FROM documents), (VALUES {ks}) t(k)
),
e AS (SELECT DISTINCT src, dst FROM e0 WHERE dst <> src),
chain AS (
  SELECT src, dst,
         lag(dst) OVER (PARTITION BY src ORDER BY dst) AS prev
  FROM e
),
ce AS (SELECT prev AS src, dst FROM chain WHERE prev IS NOT NULL),
edges AS (SELECT src, dst FROM ce UNION SELECT dst, src FROM ce),
walk(node, root) AS (
  SELECT src, src FROM edges
  UNION
  SELECT g.dst, w.root FROM walk w JOIN edges g ON g.src = w.node
),
comp AS (SELECT node, min(root) AS component FROM walk GROUP BY node),
auth AS (SELECT dst AS auth_id, count(*)::BIGINT AS in_deg
         FROM e GROUP BY 1),
labeled AS (
  SELECT a.auth_id, a.in_deg,
         coalesce(c.component, a.auth_id) AS component
  FROM auth a LEFT JOIN comp c ON c.node = a.auth_id
),
sums AS (
  SELECT component, sum(in_deg)::BIGINT AS comp_indeg,
         count(*)::BIGINT AS comp_nodes
  FROM labeled GROUP BY 1
),
tot AS (SELECT count(*)::BIGINT AS n_auth FROM labeled)
SELECT l.auth_id, l.component, l.in_deg, s.comp_nodes,
       ((s.comp_nodes * l.in_deg * {MICRO})
        // (tot.n_auth * s.comp_indeg))::BIGINT AS auth_micro
FROM labeled l JOIN sums s USING (component) CROSS JOIN tot
"""


SALSA_SQL = _salsa_sql()


QUERIES: dict[str, tuple] = {
    "web_salsa_scores": (salsa_scores, SALSA_SQL),
}
