"""Filter-agreement audit — pairwise Cohen's kappa between the three
keep/drop quality filters (Gopher rules, C4 line filters, hashed
linear classifier).  Pipeline calibration work (the FineWeb and Dolma
ablation write-ups) runs exactly this audit: raw percent agreement is
inflated when filters share a base rate, so kappa corrects for chance
— near-zero kappa with high raw agreement means a filter adds no
information and its compute can be dropped; negative kappa flags
filters fighting each other on the same documents.

Composition, not new machinery: the per-document booleans come from
`webfunnel.quality_funnel_frame` (all three signals fused into one
scan projection — zero joins); this operator adds ONE global
aggregation.  Exact integer kappa per pair (n docs, nx/ny per-filter
keeps, n11/n00 joint counts):

    po_num = n11 + n00                       -- observed agreement * n
    pe_num = nx*ny + (n-nx)*(n-ny)           -- chance agreement * n^2
    kappa_micro = (po_num*n - pe_num) * 1e6 div (n*n - pe_num)
    (NULL when a filter is constant: n*n == pe_num)

``n*n`` bounds this to ~3e9 documents per audit; past that production
ratio-reduces by gcd or audits a uniform sample (kappa is a rate),
documented here.

Plan shape (the scale story): the funnel's scan projection plus ONE
map-side-combinable global agg down to a single row of nine bigint
counters; the three pair rows are exploded from that one row with a
literal inline table.  No extra corpus pass per pair — all cross
counts ride the same aggregate.

Reference scope anchor: beyond-reference web-scale operator (quality
tier); the calibration layer over `corpus_quality_funnel` /
`corpus_gopher_rules` / `corpus_c4_filters` / `text_quality_classifier`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .webfunnel import QUALITY_FUNNEL_SQL, quality_funnel

MICRO = 1_000_000

_PAIRS = (
    ("gopher~c4", "gopher_keep", "c4_keep"),
    ("gopher~classifier", "gopher_keep", "clf_keep"),
    ("c4~classifier", "c4_keep", "clf_keep"),
)


def filter_agreement_frame(funnel: DataFrame) -> DataFrame:
    b = lambda c: F.col(c).cast("bigint")  # noqa: E731
    aggs = [F.count("*").cast("bigint").alias("n")]
    for name, x, y in _PAIRS:
        key = name.replace("~", "_").replace("classifier", "clf")
        aggs += [
            F.sum(b(x)).cast("bigint").alias(f"nx_{key}"),
            F.sum(b(y)).cast("bigint").alias(f"ny_{key}"),
            F.sum(b(x) * b(y)).cast("bigint").alias(f"n11_{key}"),
            F.sum((1 - b(x)) * (1 - b(y))).cast("bigint")
            .alias(f"n00_{key}"),
        ]
    one = funnel.agg(*aggs)
    rows = []
    for name, _x, _y in _PAIRS:
        key = name.replace("~", "_").replace("classifier", "clf")
        rows.append(
            F.struct(
                F.lit(name).alias("pair"),
                F.col("n").alias("n_docs"),
                F.col(f"n11_{key}").alias("n11"),
                F.col(f"n00_{key}").alias("n00"),
                F.expr(
                    f"((n11_{key} + n00_{key}) * {MICRO}) div n"
                ).cast("bigint").alias("agree_micro"),
                F.expr(
                    f"case when n * n = nx_{key} * ny_{key}"
                    f" + (n - nx_{key}) * (n - ny_{key}) then null else "
                    f"((n11_{key} + n00_{key}) * n"
                    f" - (nx_{key} * ny_{key}"
                    f"    + (n - nx_{key}) * (n - ny_{key}))) * {MICRO}"
                    f" div (n * n - (nx_{key} * ny_{key}"
                    f"    + (n - nx_{key}) * (n - ny_{key}))) end"
                ).cast("bigint").alias("kappa_micro"),
            )
        )
    return one.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.*")


def filter_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    return filter_agreement_frame(quality_funnel(spark, sf_dir))


def _agree_sql() -> str:
    pair_rows = []
    for name, x, y in _PAIRS:
        pair_rows.append(
            f"""SELECT '{name}' AS pair, n AS n_docs,
       sum({x}*{y}) AS n11, sum((1-{x})*(1-{y})) AS n00,
       sum({x}) AS nx, sum({y}) AS ny
FROM b CROSS JOIN tot GROUP BY n"""
        )
    unioned = "\nUNION ALL\n".join(pair_rows)
    return f"""
WITH f AS ({QUALITY_FUNNEL_SQL}),
b AS (
  SELECT gopher_keep::BIGINT AS gopher_keep,
         c4_keep::BIGINT AS c4_keep,
         clf_keep::BIGINT AS clf_keep
  FROM f
),
tot AS (SELECT count(*)::BIGINT AS n FROM b),
p AS ({unioned})
SELECT pair, n_docs, n11::BIGINT AS n11, n00::BIGINT AS n00,
       (((n11 + n00) * {MICRO}) // n_docs)::BIGINT AS agree_micro,
       (CASE WHEN n_docs * n_docs
                  = nx * ny + (n_docs - nx) * (n_docs - ny) THEN NULL
        ELSE (((n11 + n00) * n_docs
               - (nx * ny + (n_docs - nx) * (n_docs - ny))) * {MICRO})
             // (n_docs * n_docs
                 - (nx * ny + (n_docs - nx) * (n_docs - ny)))
        END)::BIGINT AS kappa_micro
FROM p
"""


FILTER_AGREEMENT_SQL = _agree_sql()


QUERIES: dict[str, tuple] = {
    "corpus_filter_agreement": (filter_agreement, FILTER_AGREEMENT_SQL),
}
