"""Seed-distance (crawl-depth) labeling — parallel BFS from a seed
set, the prior behind every frontier scheduler: page quality decays
with distance from curated seeds (Fetterly/Craswell's crawl-depth
studies; Cho & Garcia-Molina's ordering work; OPIC and TrustRank both
start from exactly such a seed set — webtrust.py uses the same seed
discipline for spam mass).

Semantics (frozen): graph = weblpa.py's residue-block hash graph;
seeds = ``doc_id % 53 == 0`` (the webtrust seed-roll discipline).
``BFS_ROUNDS = 3`` synchronous frontier expansions: ``dist(v) =
min(dist(v), 1 + min over in-neighbors)`` per round — label-correct
for every node within 3 hops; farther nodes report the ``-1``
unreached sentinel (never NULL ints).  Output per node: ``(doc_id,
is_seed, hop_dist)``.

Plan shape (the scale story): this is Pregel BFS expressed
relationally — each round ONE equi-join of the checkpointed
adjacency against the current distance table + a map-side min-agg +
a left-join merge; rows are 2 bigints.  Distance tables stay
|V|-sized regardless of edge count; the blocks structure guarantees
unreached nodes exist at every fixture scale (residue classes with
no seed member stay at -1... except every class has seeds since 53
and 4 are coprime — unreached polarity instead comes from nodes
whose 3-hop ball misses all seeds).  Zero Python (plan-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import sql_hash60
from .weblpa import LPA_BLOCKS, LPA_OUT_K, block_edges

SEED_MOD = 53
BFS_ROUNDS = 3


def seed_distance_frame(nodes: DataFrame, adj: DataFrame) -> DataFrame:
    adj = adj.localCheckpoint()
    dist = nodes.select(
        "doc_id",
        F.when(F.col("doc_id") % SEED_MOD == 0, F.lit(0))
        .otherwise(F.lit(None)).cast("bigint").alias("d"),
    )
    for _ in range(BFS_ROUNDS):
        reached = (
            adj.join(
                dist.filter(F.col("d").isNotNull())
                .withColumnRenamed("doc_id", "u"),
                "u",
            )
            .groupBy("v")
            .agg((F.min("d") + 1).alias("nd"))
            .withColumnRenamed("v", "doc_id")
        )
        dist = dist.join(reached, "doc_id", "left").select(
            "doc_id",
            F.least(
                F.coalesce("d", F.lit(1 << 40)),
                F.coalesce("nd", F.lit(1 << 40)),
            ).alias("d"),
        ).select(
            "doc_id",
            F.when(F.col("d") < (1 << 40), F.col("d"))
            .otherwise(F.lit(None)).cast("bigint").alias("d"),
        )
    return dist.select(
        "doc_id",
        (F.col("doc_id") % SEED_MOD == 0).alias("is_seed"),
        F.coalesce("d", F.lit(-1)).cast("bigint").alias("hop_dist"),
    )


def seed_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    n = nodes.count()
    return seed_distance_frame(nodes, block_edges(nodes, n))


def _seed_sql() -> str:
    h = sql_hash60("src::VARCHAR || ':' || k::VARCHAR")
    cells = f"((n + {LPA_BLOCKS} - 1) // {LPA_BLOCKS})"
    dst = f"(({h} % {cells}) * {LPA_BLOCKS} + src % {LPA_BLOCKS})"
    ctes = [
        f"""nodes AS (SELECT doc_id FROM documents),
n1 AS (SELECT count(*)::BIGINT AS n FROM nodes),
fwd AS (
  SELECT src, {dst} AS dst
  FROM (SELECT doc_id AS src, unnest(range(0, {LPA_OUT_K})) AS k
        FROM nodes), n1
  WHERE {dst} != src AND {dst} < n
),
adj AS (SELECT DISTINCT u, v FROM
        (SELECT src AS u, dst AS v FROM fwd
         UNION ALL SELECT dst, src FROM fwd)),
d0 AS (SELECT doc_id,
              CASE WHEN doc_id % {SEED_MOD} = 0 THEN 0 END::BIGINT AS d
       FROM nodes)"""
    ]
    for i in range(1, BFS_ROUNDS + 1):
        p = i - 1
        ctes.append(
            f"""r{i} AS (SELECT a.v AS doc_id, (min(x.d) + 1)::BIGINT AS nd
      FROM adj a JOIN d{p} x ON x.doc_id = a.u
      WHERE x.d IS NOT NULL GROUP BY 1),
d{i} AS (SELECT p.doc_id,
               least(coalesce(p.d, 1099511627776),
                     coalesce(r.nd, 1099511627776)) AS dd,
               CASE WHEN least(coalesce(p.d, 1099511627776),
                             coalesce(r.nd, 1099511627776))
                         < 1099511627776
                    THEN least(coalesce(p.d, 1099511627776),
                               coalesce(r.nd, 1099511627776))
               END::BIGINT AS d
        FROM d{p} p LEFT JOIN r{i} r USING (doc_id))"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT doc_id, (doc_id % {SEED_MOD} = 0) AS is_seed,
       coalesce(d, -1)::BIGINT AS hop_dist
FROM d{BFS_ROUNDS}"""
    )


SEED_SQL = _seed_sql()


QUERIES: dict[str, tuple] = {
    "web_seed_distance": (seed_distance, SEED_SQL),
}
