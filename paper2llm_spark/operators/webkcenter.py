"""Gonzalez farthest-point k-center seeding (Gonzalez 1985,
"Clustering to minimize the maximum intercluster distance" — the
classic 2-approximation) — greedy MAX-MIN diversity selection over
the embedding space.  Data-curation use: pick k maximally spread
exemplars (coreset seeds, diverse few-shot pools, k-means++-style
initialization for the IVF/k-means family in similarity.py); unlike
uniform sampling it provably covers the space's extremes.

Semantics (frozen): squared L2 distances over double-cast
embeddings; distances ROUNDED to 4dp before any comparison (the
similarity.py wash — min/argmax decisions are then identical across
engines) and min-distances maintained as ``least(prev, new)`` so
every round's state is the rounded value, never a re-derivation;
seed = lowest vec_id; each of the K-1 subsequent rounds picks the
vector with the LARGEST rounded min-distance to the chosen set
(ties by lowest vec_id).  Output: ``(rank, vec_id, mindist4)`` —
mindist4 is the selection-time distance (0 for the seed), the
sequence of which is exactly Gonzalez's telescoping radius bound.

Plan shape (the scale story): each round is one full-scan projection
(64-term codegen add-chain per distance — identical left-associated
shape in both engines, no fold-order ambiguity) plus a
TakeOrderedAndProject(1) — the argmax never sorts the corpus; the
chosen center returns to the plan as K LITERALS, not a join (the
k-means centroid discipline: driver state is K·64 doubles, bounded
by construction).  K scans of 10^12 rows is the algorithm's real
cost everywhere it is deployed; the alternative single-pass sketches
(k-center streaming) trade the guarantee away.  Zero Python UDFs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

K_CENTERS = 8
DIM = 64


def _dist2(v: Column, center: list[float]) -> Column:
    """64-term left-associated add chain — identical shape to the SQL
    dual's chain (NOT an aggregate fold: fold order is engine
    ambiguity; an explicit chain is not)."""
    terms = [
        (F.element_at(v, i + 1) - F.lit(center[i]))
        * (F.element_at(v, i + 1) - F.lit(center[i]))
        for i in range(DIM)
    ]
    return reduce(lambda a, b: a + b, terms)


def kcenter_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .localCheckpoint()
    )
    seed = emb.orderBy("vec_id").limit(1).collect()[0]
    chosen = [(1, seed.vec_id, 0.0)]
    center = list(seed.v)
    state = emb.select(
        "vec_id", "v", F.round(_dist2(F.col("v"), center), 4).alias("md")
    )
    for rank in range(2, K_CENTERS + 1):
        nxt = (
            state.orderBy(F.col("md").desc(), F.col("vec_id"))
            .limit(1)
            .collect()[0]
        )
        chosen.append((rank, nxt.vec_id, float(nxt.md)))
        center = list(nxt.v)
        if rank < K_CENTERS:
            state = state.select(
                "vec_id",
                "v",
                F.least(
                    F.col("md"), F.round(_dist2(F.col("v"), center), 4)
                ).alias("md"),
            ).localCheckpoint()
    return spark.createDataFrame(
        chosen, "rank long, vec_id long, mindist4 double"
    )


def _sql_dist(a: str, b: str) -> str:
    return " + ".join(
        f"({a}[{i}]-{b}[{i}])*({a}[{i}]-{b}[{i}])" for i in range(1, DIM + 1)
    )


def _kcenter_sql() -> str:
    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        "s1 AS (SELECT vec_id, v FROM e"
        " WHERE vec_id = (SELECT min(vec_id) FROM e))",
        f"m1 AS MATERIALIZED (SELECT e.vec_id, e.v,"
        f" round({_sql_dist('e.v', 's1.v')}, 4) AS md FROM e, s1)",
    ]
    outs = ["SELECT 1::BIGINT AS rank, vec_id, 0.0::DOUBLE AS mindist4 FROM s1"]
    for r in range(2, K_CENTERS + 1):
        p = r - 1
        ctes.append(
            f"s{r} AS MATERIALIZED (SELECT vec_id, v, md FROM m{p}"
            f" ORDER BY md DESC, vec_id LIMIT 1)"
        )
        outs.append(
            f"SELECT {r}::BIGINT, vec_id, md::DOUBLE FROM s{r}"
        )
        if r < K_CENTERS:
            ctes.append(
                f"m{r} AS MATERIALIZED (SELECT m.vec_id, m.v,"
                f" least(m.md, round({_sql_dist('m.v', f's{r}.v')}, 4)) AS md"
                f" FROM m{p} m, s{r})"
            )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(outs)


KCENTER_SQL = _kcenter_sql()


QUERIES: dict[str, tuple] = {
    "ann_kcenter_seeds": (kcenter_seeds, KCENTER_SQL),
}
