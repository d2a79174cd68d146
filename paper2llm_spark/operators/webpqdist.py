"""Product-quantization distortion audit — the compression-health
table of a PQ index (Jégou, Douze & Schmid TPAMI 2011 §IV measures
exactly this: per-subquantizer mean squared error; Ge et al. OPQ
2013 optimizes against it; "dead codes" are the standard codebook
pathology check).  Before serving `ann_pq_topk`'s 4-byte codes you
audit what the compression costs: per subspace, the reconstruction
error the chosen code leaves behind and how much of the codebook is
actually used.

Composes over the SAME frozen codebooks (`similarity.PQ_CODEBOOKS`)
and the SAME staged round-6 distance arrays as `ann_pq_topk` — the
audit certifies the deployed quantizer, not a re-derivation.

Semantics (frozen): per vector and subspace ``m``, the quantization
error is ``err_m = min_c round(||s_m - c||^2, 6)`` (the encode
pass's own argmin objective), frozen to exact micro-units
``floor(err * 1e6 + 0.5)`` — the identical double rounds the same
way in both engines (websearch discipline), and all AGGREGATION is
exact bigint (never an order-dependent float sum).  Per subspace:

* ``n_vecs``, ``total_err_micro``, ``max_err_micro``
* ``mean_err_micro = total div n``
* ``codes_used`` — distinct codes chosen (<= N_CODES; dead codes
  show here)

Plan shape (the scale story): encode + error are scan-side codegen
(distance arrays STAGED as bound attributes before min/argmin — the
similarity.py no-CSE discipline); ALL subspaces fold into ONE
map-side partial aggregate (sums/maxes + bounded collect_sets of
<= N_CODES small ints), output rows exploded from the single
aggregated row.  One one-row exchange, zero joins, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import M_SUB, N_CODES, SUB_DIM, _emb, _pq_dists_expr

MICRO = 1_000_000


def pq_distortion_frame(emb: DataFrame) -> DataFrame:
    subs = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    ).select(
        "vec_id",
        *[
            F.slice("v", m * SUB_DIM + 1, SUB_DIM).alias(f"s{m}")
            for m in range(M_SUB)
        ],
    )
    staged = subs.select(
        "vec_id",
        *[
            _pq_dists_expr(F.col(f"s{m}"), m).alias(f"d{m}")
            for m in range(M_SUB)
        ],
    )
    encoded = staged.select(
        "vec_id",
        *[
            F.expr(
                f"cast(floor(array_min(d{m}) * {MICRO} + 0.5) as bigint)"
            ).alias(f"err{m}")
            for m in range(M_SUB)
        ],
        *[
            F.array_position(F.col(f"d{m}"), F.array_min(F.col(f"d{m}")))
            .cast("bigint")
            .alias(f"code{m}")
            for m in range(M_SUB)
        ],
    )
    aggs = [F.count("*").cast("bigint").alias("n_vecs")]
    for m in range(M_SUB):
        aggs += [
            F.sum(f"err{m}").cast("bigint").alias(f"tot{m}"),
            F.max(f"err{m}").cast("bigint").alias(f"mx{m}"),
            F.size(F.collect_set(f"code{m}")).cast("bigint").alias(f"cu{m}"),
        ]
    one = encoded.agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(m).cast("bigint").alias("subspace"),
                    F.col(f"tot{m}").alias("tot"),
                    F.col(f"mx{m}").alias("mx"),
                    F.col(f"cu{m}").alias("cu"),
                )
                for m in range(M_SUB)
            ]
        )
    )
    return one.select("n_vecs", rows.alias("r")).select(
        F.col("r.subspace").alias("subspace"),
        "n_vecs",
        F.col("r.tot").alias("total_err_micro"),
        F.expr("r.tot div n_vecs").cast("bigint").alias("mean_err_micro"),
        F.col("r.mx").alias("max_err_micro"),
        F.col("r.cu").alias("codes_used"),
    )


def pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pq_distortion_frame(_emb(spark, sf_dir))


def _book_sql(m: int) -> str:
    from .similarity import PQ_CODEBOOKS

    return (
        "["
        + ", ".join(
            "[" + ", ".join(repr(float(x)) for x in c) + "]"
            for c in PQ_CODEBOOKS[m]
        )
        + "]::DOUBLE[][]"
    )


def _dists_sql(m: int) -> str:
    return (
        f"list_transform({_book_sql(m)}, c -> round("
        f"list_dot_product(s{m}, s{m}) - 2.0 * list_dot_product(s{m}, c)"
        f" + list_dot_product(c, c), 6))"
    )


_SUB_COLS = ", ".join(
    f"v[{m * SUB_DIM + 1}:{(m + 1) * SUB_DIM}] AS s{m}" for m in range(M_SUB)
)

_ENC_COLS = ", ".join(
    f"floor(list_min({_dists_sql(m)}) * {MICRO} + 0.5)::BIGINT AS err{m},\n"
    f"       list_position({_dists_sql(m)}, list_min({_dists_sql(m)}))::BIGINT"
    f" AS code{m}"
    for m in range(M_SUB)
)

_AGG_COLS = ",\n         ".join(
    f"sum(err{m})::BIGINT AS tot{m}, max(err{m})::BIGINT AS mx{m},"
    f" count(DISTINCT code{m})::BIGINT AS cu{m}"
    for m in range(M_SUB)
)

_ROWS = ",\n    ".join(
    f"{{'subspace': {m}::BIGINT, 'tot': tot{m}, 'mx': mx{m}, 'cu': cu{m}}}"
    for m in range(M_SUB)
)

PQ_DISTORTION_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
subs AS (SELECT vec_id, {_SUB_COLS} FROM e),
encoded AS (
  SELECT vec_id, {_ENC_COLS}
  FROM subs
),
one AS (
  SELECT count(*)::BIGINT AS n_vecs,
         {_AGG_COLS}
  FROM encoded
),
stacked AS (SELECT n_vecs, unnest([{_ROWS}]) AS r FROM one)
SELECT r['subspace']::BIGINT AS subspace,
       n_vecs,
       r['tot']::BIGINT AS total_err_micro,
       (r['tot'] // n_vecs)::BIGINT AS mean_err_micro,
       r['mx']::BIGINT AS max_err_micro,
       r['cu']::BIGINT AS codes_used
FROM stacked
"""


QUERIES: dict[str, tuple] = {
    "ann_pq_distortion": (pq_distortion, PQ_DISTORTION_SQL),
}
