"""Sparse random projection (Achlioptas 2003, "Database-friendly
random projections: Johnson-Lindenstrauss with binary coins") — the
JL dimensionality reduction whose projection matrix is {+1, 0, -1}
with probabilities {1/6, 2/3, 1/6}: two thirds of the multiplies
vanish and the rest are sign flips, which is why it IS the
database-friendly variant — at 10^12 embeddings the projection is
pure adds on a pruned column, no BLAS, no model artifact to ship.
Downstream, the 16-d output feeds this repo's LSH/IVF ANN family at
a quarter of the vector bytes.

Semantics (frozen): the 64×16 sign matrix derives from
md5("rp:{i}:{j}") % 6 → {0: +1, 1: -1, else 0} — the literal-table
discipline (PQ codebooks, the CDC gear table): the SAME integer
literals are baked into both engines' expressions, so there is no
RNG and no train/apply skew.  Projection j = Σ_i v_i·s_ij over the
~1/3 surviving terms, summed in ASCENDING i order in both engines
(left-associated adds — float sums are order-sensitive, identical
shape is what makes the hash hold), scaled by √3 deferred to the
consumer (a constant factor is irrelevant to cosine/LSH), rounded
to 4dp (the similarity.py wash for last-ulp divergence).  Output:
``(vec_id, p0..p15)``.

Plan shape (the scale story): the entire projection is ONE codegen
projection — 16 add-chains over a single scan of the embeddings
table; zero exchanges, zero joins, zero Python, no broadcast (the
matrix lives in the instruction stream, not in data).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IN_DIM = 64
OUT_DIM = 16


def _sign(i: int, j: int) -> int:
    h = int(hashlib.md5(f"rp:{i}:{j}".encode()).hexdigest()[:8], 16) % 6
    return 1 if h == 0 else (-1 if h == 1 else 0)


# frozen 64x16 sign matrix — identical literals in both engines
SIGNS = [[_sign(i, j) for j in range(OUT_DIM)] for i in range(IN_DIM)]


def sparse_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return projection_frame(emb)


def projection_frame(emb: DataFrame) -> DataFrame:
    v = F.col("v")
    staged = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cols = []
    for j in range(OUT_DIM):
        term = None
        for i in range(IN_DIM):
            s = SIGNS[i][j]
            if s == 0:
                continue
            t = F.element_at(v, i + 1) if s == 1 else -F.element_at(v, i + 1)
            term = t if term is None else term + t
        cols.append(F.round(term, 4).alias(f"p{j}"))
    return staged.select("vec_id", *cols)


def _rp_sql() -> str:
    cols = []
    for j in range(OUT_DIM):
        parts = []
        for i in range(IN_DIM):
            s = SIGNS[i][j]
            if s == 0:
                continue
            parts.append(f"{'-' if s == -1 else '+'} v[{i + 1}]")
        expr = " ".join(parts).lstrip("+ ")
        if parts[0].startswith("-"):
            expr = parts[0].replace(" ", "") + " " + " ".join(parts[1:])
        cols.append(f"round({expr}, 4) AS p{j}")
    body = ",\n       ".join(cols)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT vec_id,
       {body}
FROM e
"""


RP_SQL = _rp_sql()


QUERIES: dict[str, tuple] = {
    "ann_sparse_projection": (sparse_projection, RP_SQL),
}
