"""AMS second-moment sketch (Alon, Matias & Szegedy, STOC'96 — the
Gödel-prize tug-of-war sketch).  F2 = sum of squared term frequencies
is the collision mass of the vocabulary: it prices hash-join skew,
self-join output size, and repetition-heaviness of a corpus slice.
Exact F2 needs the full term histogram; the AMS estimator needs
``R`` counters, period — the trade every streaming system (and
DataSketches' tug-of-war lineage) is built on.

Semantics (frozen): ``R = 16`` estimators; the four-wise-independent
sign stand-in is the portable 60-bit md5 hash's low bit per
``(term, r)``: ``s_r(w) = 1 - 2 * (hash60(w || '#' || r) % 2)``.
Each estimator ``X_r = sum_w s_r(w) * f_w`` is an EXACT bigint;
``est_r = X_r^2``.  The paper's two-level boosting is kept intact —
MEAN within a group, MEDIAN across groups (a bare median of X_r^2
sits ~2x low: X is near-symmetric around 0, so median(X^2) ~
0.455*F2 — measured on the fixture corpus before this was fixed):
``G = 4`` groups of 4, ``Y_j = (sum of the group's est_r) div 4``,
estimate = exact integer median ``(y2 + y3) div 2`` of the sorted
group means.  Relative error scales as ``sqrt(2/s1)`` per the paper
— heavy-tailed vocabularies (tiny Heaps constant, one dominant term)
sit at the noisy end, so production sizing raises the group size, not
the group count.  The exact ``F2 = sum f_w^2`` is emitted next to the
estimate with the error in ppm — the sketch ships WITH its own
ground-truth audit, which is what makes the gate non-vacuous.
Output: one row ``(n_tokens, n_terms, f2_exact, f2_est, err_ppm)``.

Plan shape (the scale story): ONE corpus-sized exchange — the
map-side-combinable term-frequency groupBy; the R estimators are R
conditional sums over the COLLAPSED vocabulary table in a single agg
(no fanout, no joins); the median of 16 bigints is a literal
least/greatest-free array sort of a 16-element collected array on ONE
row.  Zero Python, zero corpus joins (plan-asserted).  At 10^12
tokens the shuffle is the Heaps-bounded vocabulary, the sketch state
is 16 bigints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, portable_hash60, sql_hash60, tokens

AMS_R = 16
AMS_G = 4


def _sign(term_col, r: int):
    return 1 - 2 * (
        portable_hash60(
            F.concat(term_col, F.lit(f"#{r}"))
        ) % 2
    )


def ams_frame(docs: DataFrame) -> DataFrame:
    tf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    aggs = [
        F.sum("f").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum(F.col("f") * F.col("f")).alias("f2_exact"),
    ] + [
        F.sum(_sign(F.col("w"), r) * F.col("f")).alias(f"x{r}")
        for r in range(AMS_R)
    ]
    one = tf.agg(*aggs)
    gsz = AMS_R // AMS_G
    groups = ", ".join(
        "(" + " + ".join(
            f"x{r} * x{r}" for r in range(g * gsz, (g + 1) * gsz)
        ) + f") div {gsz}"
        for g in range(AMS_G)
    )
    arr = f"sort_array(array({groups}))"
    mid = AMS_G // 2
    return one.select(
        "n_tokens", "n_terms", "f2_exact",
        F.expr(
            f"(element_at({arr}, {mid}) + element_at({arr}, {mid + 1}))"
            " div 2"
        ).cast("bigint").alias("f2_est"),
    ).select(
        "n_tokens", "n_terms", "f2_exact", "f2_est",
        F.expr(
            "abs(f2_est - f2_exact) * 1000000 div f2_exact"
        ).cast("bigint").alias("err_ppm"),
    )


def ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return ams_frame(docs.select("text"))


_TOKLIST = SQL_TOKENS.format(expr="text")


def _ams_sql() -> str:
    signs = ", ".join(
        "sum((1 - 2 * ({h} % 2)) * f)::BIGINT AS x{r}".format(
            h=sql_hash60(f"w || '#{r}'"), r=r
        )
        for r in range(AMS_R)
    )
    gsz = AMS_R // AMS_G
    ests = ", ".join(
        "(" + " + ".join(
            f"x{r} * x{r}" for r in range(g * gsz, (g + 1) * gsz)
        ) + f") // {gsz}"
        for g in range(AMS_G)
    )
    mid = AMS_G // 2
    return f"""
WITH tf AS (
  SELECT w, count(*)::BIGINT AS f
  FROM (SELECT unnest({_TOKLIST}) AS w FROM documents)
  GROUP BY 1
),
one AS (
  SELECT sum(f)::BIGINT AS n_tokens,
         count(*)::BIGINT AS n_terms,
         sum(f * f)::BIGINT AS f2_exact,
         {signs}
  FROM tf
),
est AS (
  SELECT n_tokens, n_terms, f2_exact,
         ((list_sort([{ests}])[{mid}]
           + list_sort([{ests}])[{mid + 1}]) // 2)::BIGINT AS f2_est
  FROM one
)
SELECT n_tokens, n_terms, f2_exact, f2_est,
       (abs(f2_est - f2_exact) * 1000000 // f2_exact)::BIGINT AS err_ppm
FROM est
"""


AMS_SQL = _ams_sql()


QUERIES: dict[str, tuple] = {
    "sketch_ams_f2": (ams_f2, AMS_SQL),
}
