"""Cohort LTV curves — cumulative revenue per user by cohort age
(the lifetime-value triangle every subscription/commerce analytics
stack draws; Fader & Hardie's CLV literature formalizes the curve
this table plots; the revenue companion of
`events_retention_cohorts`' activity view).

Semantics (frozen): ``cohort = first active week`` and ``age =
week - cohort`` on the Monday-epoch integer week grid (the
weblifecycle rule — no date_trunc locale surface), over the SAME
hash-sparsified (user, week) activity grid as
`events_lifecycle_states` (cells with ``(user_id*31 + week) % 5 ==
0`` dropped — every fixture user is otherwise born in the same
week and the cohort axis would be a single column; the shared rule
keeps the two ledgers consistent).  Revenue per event frozen to
EXACT cents (``floor(value*100 + 0.5)``, the webrfm discipline)
before any summation.  Per (cohort, age):

* ``n_active``     — distinct users active at that age
* ``revenue_cents``— exact cents earned by the cohort at that age
* ``cum_revenue_cents`` — running total over ages within the cohort
* ``ltv_microcents = cum_revenue_cents * 1e6 div n_cohort`` —
  cumulative value per COHORT MEMBER (the LTV curve's y-axis;
  n_cohort = users born that week, constant down the column)

Plan shape (the scale story): corpus work is ONE exchange — the
map-side-combinable ``groupBy(user_id, week)`` cents rollup; the
cohort label comes from a min-week window over the same
user-partitioned pass (shared hashpartitioning(user_id) — no
second corpus movement); everything after ((cohort, age) collapse,
running sum, cohort sizes re-entering broadcast) rides tables
bounded by |weeks|^2.  Zero Python; props/event_type never read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .weblifecycle import WEEK_EPOCH

MICRO = 1_000_000


def cohort_ltv_frame(events: DataFrame) -> DataFrame:
    per_uw = events.select(
        "user_id",
        F.expr(
            f"cast(datediff(cast(ts as date), date'{WEEK_EPOCH}') div 7"
            f" as bigint)"
        ).alias("week"),
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("cents"),
    ).groupBy("user_id", "week").agg(
        F.sum("cents").cast("bigint").alias("cents")
    ).filter(F.expr("(user_id * 31 + week) % 5 != 0"))
    w_user = Window.partitionBy("user_id")
    labeled = per_uw.select(
        "user_id",
        F.min("week").over(w_user).alias("cohort"),
        (F.col("week") - F.min("week").over(w_user)).alias("age"),
        "cents",
    )
    cells = labeled.groupBy("cohort", "age").agg(
        F.count("*").cast("bigint").alias("n_active"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )
    sizes = labeled.filter(F.col("age") == 0).groupBy("cohort").agg(
        F.count("*").cast("bigint").alias("n_cohort")
    )
    w_run = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "age",
            "n_active",
            "revenue_cents",
            F.sum("revenue_cents").over(w_run).cast("bigint")
            .alias("cum_revenue_cents"),
            "n_cohort",
        )
        .select(
            "cohort",
            "age",
            "n_active",
            "revenue_cents",
            "cum_revenue_cents",
            F.expr(f"cum_revenue_cents * {MICRO} div n_cohort")
            .cast("bigint")
            .alias("ltv_microcents"),
        )
    )


def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return cohort_ltv_frame(events)


COHORT_LTV_SQL = f"""
WITH per_uw AS (
  SELECT user_id,
         (date_diff('day', DATE '{WEEK_EPOCH}', ts::DATE) // 7)::BIGINT
           AS week,
         sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS cents
  FROM events GROUP BY 1, 2
  HAVING (user_id * 31 + week) % 5 != 0
),
labeled AS (
  SELECT user_id,
         min(week) OVER (PARTITION BY user_id) AS cohort,
         week - min(week) OVER (PARTITION BY user_id) AS age,
         cents
  FROM per_uw
),
cells AS (
  SELECT cohort, age,
         count(*)::BIGINT AS n_active,
         sum(cents)::BIGINT AS revenue_cents
  FROM labeled GROUP BY 1, 2
),
sizes AS (
  SELECT cohort, count(*)::BIGINT AS n_cohort
  FROM labeled WHERE age = 0 GROUP BY 1
)
SELECT c.cohort, c.age, c.n_active, c.revenue_cents,
       (sum(c.revenue_cents) OVER (PARTITION BY c.cohort ORDER BY c.age
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
         AS cum_revenue_cents,
       ((sum(c.revenue_cents) OVER (PARTITION BY c.cohort ORDER BY c.age
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        * {MICRO} // s.n_cohort)::BIGINT AS ltv_microcents
FROM cells c JOIN sizes s USING (cohort)
"""


QUERIES: dict[str, tuple] = {
    "events_cohort_ltv": (cohort_ltv, COHORT_LTV_SQL),
}
