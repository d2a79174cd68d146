"""TrustRank + spam-mass estimation (Gyongyi, Garcia-Molina & Pedersen,
VLDB 2004; Gyongyi et al., VLDB 2006 "Link spam detection based on mass
estimation") — the link-spam demotion pass crawl curation runs next to
PageRank: propagate trust from a reviewed seed set through the SAME
damped recurrence, then flag pages whose PageRank is NOT backed by
trust (high relative spam mass).

Frozen algorithm (deterministic; the papers' shape):

1. the graph is the engine's synthetic hash-derived edge list
   (``webgraph.synth_edges`` — identical in both engines);
2. seed oracle: the papers pick seeds by inverse PageRank + human
   review; the frozen stand-in is a hash roll
   (``h(doc_id:seed) % SEED_MOD == 0``, ~14% of nodes);
3. two vectors through the SAME exact-integer recurrence
   ``r_i = base + (85 * sum_in(r_{i-1} div deg)) div 100``:
   PageRank (base/init on every node) and TrustRank (base/init on
   seeds ONLY — the biased teleportation that defines TrustRank);
4. trust is rescaled onto PageRank's total mass
   (``trust * total_pr div total_tr`` — exact bigint; the product
   stays under 2^63 through ~10^9-node corpora, past that production
   reduces the ratio first, documented);
5. relative spam mass = ``(pr - min(pr, trust_scaled)) * 1e6 div pr``
   — 0 for trust-backed pages, -> 1e6 for pure spam-supported rank.

Plan shape (the scale story): edges + out-degree are materialized ONCE
(``localCheckpoint``) and feed BOTH vector iterations; each round
shuffles only (dst, bigint) contribution rows through one
map-side-combinable groupBy (the ``webgraph`` discipline); the two
total-mass scalars re-enter as a 1-row broadcast crossJoin (the HITS
normalization pattern — never a driver collect); every rank travels as
exact bigint micro-units so the result is independent of partition
order AND bit-identical to the DuckDB dual's unrolled CTEs.

The hash-rolled seed set guarantees both polarities on the corpus:
seeded nodes collect trust, and any node reachable only from
non-seeded regions shows high spam mass — the driver hash certifies
the full propagation, normalization and mass arithmetic.

Reference scope anchor: beyond-reference web-scale operator
(crawl-quality tier); companion of `web_pagerank` / `web_hits_scores`
in `operators/webgraph.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, sql_hash60
from .webgraph import (
    PR_BASE,
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_INIT,
    PR_ITERS,
    PR_OUT_K,
    synth_edges,
)

SEED_MOD = 7  # ~14% of nodes are reviewed-trusted seeds
MICRO = 1_000_000


def _seeded_nodes(nodes: DataFrame) -> DataFrame:
    is_seed = (
        portable_hash60(F.concat(F.col("doc_id").cast("string"),
                                 F.lit(":seed"))) % SEED_MOD == 0
    ).cast("bigint")
    return nodes.select("doc_id", is_seed.alias("is_seed"))


def _rounds(nodes: DataFrame, ed: DataFrame, init: F.Column,
            base_sql: str, out: str) -> DataFrame:
    """PR_ITERS exact-integer damped rounds of
    ``r = base + (85 * sum_in(r div deg)) div 100``."""
    ranks = nodes.select("doc_id", "is_seed", init.alias(out))
    for _ in range(PR_ITERS):
        contrib = ed.join(
            ranks.select(F.col("doc_id").alias("src"), out), "src"
        ).select("dst", F.expr(f"{out} div deg").alias("c"))
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("s")) \
            .withColumnRenamed("dst", "doc_id")
        ranks = nodes.join(sums, "doc_id", "left").select(
            "doc_id", "is_seed",
            F.expr(
                f"cast({base_sql} + ({PR_DAMP_NUM} * coalesce(s, 0))"
                f" div {PR_DAMP_DEN} as bigint)"
            ).alias(out),
        )
    return ranks


def trustrank_frame(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(doc_id) nodes + (src, dst) edges -> per-node PageRank,
    TrustRank and relative spam mass, all exact micro-units."""
    seeded = _seeded_nodes(nodes)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ed = edges.join(deg, "src").localCheckpoint()
    pr = _rounds(
        seeded, ed, F.lit(PR_INIT).cast("bigint"),
        str(PR_BASE), "rank_micro",
    )
    tr = _rounds(
        seeded, ed,
        (F.lit(PR_INIT) * F.col("is_seed")).cast("bigint"),
        f"{PR_BASE} * is_seed", "trust_micro",
    ).drop("is_seed")
    both = pr.join(tr, "doc_id")
    totals = both.agg(
        F.sum("rank_micro").cast("bigint").alias("total_pr"),
        F.sum("trust_micro").cast("bigint").alias("total_tr"),
    )
    return both.crossJoin(F.broadcast(totals)).select(
        "doc_id", "is_seed", "rank_micro",
        F.expr(
            "cast((trust_micro * total_pr) div greatest(1, total_tr)"
            " as bigint)"
        ).alias("trust_scaled_micro"),
    ).withColumn(
        "spam_mass_micro",
        F.expr(
            f"(({MICRO}) * (rank_micro"
            f" - least(rank_micro, trust_scaled_micro)))"
            f" div greatest(1, rank_micro)"
        ),
    )


def trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    n = nodes.count()
    return trustrank_frame(nodes, synth_edges(nodes, n))


def _trustrank_sql() -> str:
    h = sql_hash60("src || ':' || k")
    hs = sql_hash60("doc_id || ':seed'")
    ks = ", ".join(f"({k})" for k in range(PR_OUT_K))
    ctes = [
        f"""n AS (SELECT count(*) AS n FROM documents),
e0 AS (SELECT doc_id AS src, ({h}) % n.n AS dst
       FROM documents, n, (VALUES {ks}) t(k)),
e AS (SELECT DISTINCT src, dst FROM e0 WHERE dst <> src),
deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
sd AS (SELECT doc_id,
              (CASE WHEN ({hs}) % {SEED_MOD} = 0 THEN 1 ELSE 0
               END)::BIGINT AS is_seed
       FROM documents),
p0 AS (SELECT doc_id, {PR_INIT}::BIGINT AS v FROM documents),
t0 AS (SELECT doc_id, ({PR_INIT} * is_seed)::BIGINT AS v FROM sd)"""
    ]
    for vec, base in (("p", str(PR_BASE)),
                      ("t", f"{PR_BASE} * sd.is_seed")):
        for i in range(1, PR_ITERS + 1):
            ctes.append(
                f"""{vec}c{i} AS (SELECT e.dst, sum(r.v // d.deg) AS s
       FROM e JOIN deg d USING (src)
       JOIN {vec}{i - 1} r ON r.doc_id = e.src GROUP BY 1),
{vec}{i} AS (SELECT sd.doc_id,
              ({base} + ({PR_DAMP_NUM} * coalesce({vec}c{i}.s, 0))
                           // {PR_DAMP_DEN})::BIGINT AS v
       FROM sd LEFT JOIN {vec}c{i} ON {vec}c{i}.dst = sd.doc_id)"""
            )
    ctes.append(
        f"""tot AS (SELECT (SELECT sum(v) FROM p{PR_ITERS})::BIGINT
                     AS total_pr,
                   (SELECT sum(v) FROM t{PR_ITERS})::BIGINT
                     AS total_tr)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT sd.doc_id, sd.is_seed,
       p.v AS rank_micro,
       ((t.v * tot.total_pr) // greatest(1, tot.total_tr))::BIGINT
         AS trust_scaled_micro,
       (({MICRO} * (p.v - least(p.v,
           (t.v * tot.total_pr) // greatest(1, tot.total_tr))))
         // greatest(1, p.v))::BIGINT AS spam_mass_micro
FROM sd
JOIN p{PR_ITERS} p ON p.doc_id = sd.doc_id
JOIN t{PR_ITERS} t ON t.doc_id = sd.doc_id
CROSS JOIN tot"""
    )


TRUSTRANK_SQL = _trustrank_sql()


QUERIES: dict[str, tuple] = {
    "web_trustrank": (trustrank, TRUSTRANK_SQL),
}
