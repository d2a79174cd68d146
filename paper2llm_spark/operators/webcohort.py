"""Retention cohort analysis — the standard product-analytics rollup
(the Amplitude/Mixpanel "retention table", Croll & Yoskovitz's Lean
Analytics cohort grid) over the ``events`` table: cohort users by the
ISO week of their first qualifying action, then report what fraction
of each cohort is still active k weeks later.  The qualifying action
is ``value > VALUE_MIN`` (a high-value event — the synthetic corpus's
uniform event stream needs thinning for the curve to be informative;
on real data the predicate is "purchase", "session", etc.).

Exactness: week bucketing is ``date_trunc('week')`` (Monday-based in
BOTH engines), offsets are integer day differences ``div 7``, and the
retention ratio is cleared-denominator bigint micro-units; the only
float touched is the parquet ``value`` column compared against an
integer literal (bit-identical in both engines).

Plan shape (the scale story): the qualifying filter prunes scan-side
(predicate pushdown on ``value``); every exchange after it carries
(user_id, date) or (cohort_week, offset, count) short rows — first-
week groupBy(user_id), the user-cohort equi-join (both sides already
user-clustered), the distinct-user rollup, and one |cohorts|-row
window for the cohort size.  The events payload (``props``) never
travels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

VALUE_MIN = 150  # qualifying-action threshold (thins the dense fixture)


def retention_cohorts_frame(events: DataFrame) -> DataFrame:
    a = events.filter(F.col("value") > VALUE_MIN).select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("w")
    )
    f = a.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    e = a.join(f, "user_id").select(
        "user_id", "cohort_week",
        (F.datediff("w", "cohort_week") / 7).cast("bigint")
        .alias("week_offset"),
    )
    g = e.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    cohort_size = F.sum(
        F.when(F.col("week_offset") == 0, F.col("n_users"))
    ).over(Window.partitionBy("cohort_week"))
    w = g.withColumn("cohort_size", cohort_size.cast("bigint"))
    return w.select(
        # string-serialized: pandas widens DATE to midnight timestamps
        # on the DuckDB side, breaking the driver's value compare
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset", "n_users", "cohort_size",
        F.expr("cast(1000000 * n_users div cohort_size as bigint)")
        .alias("retention_micro"),
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return retention_cohorts_frame(events)


RETENTION_SQL = f"""
WITH a AS (
  SELECT user_id, date_trunc('week', ts)::DATE AS w
  FROM events WHERE value > {VALUE_MIN}
),
f AS (SELECT user_id, min(w) AS cohort_week FROM a GROUP BY user_id),
e AS (
  SELECT a.user_id, f.cohort_week,
         ((a.w - f.cohort_week) // 7)::BIGINT AS week_offset
  FROM a JOIN f USING (user_id)
),
g AS (
  SELECT cohort_week, week_offset,
         count(DISTINCT user_id)::BIGINT AS n_users
  FROM e GROUP BY 1, 2
),
w2 AS (
  SELECT cohort_week, week_offset, n_users,
         sum(CASE WHEN week_offset = 0 THEN n_users END)
           OVER (PARTITION BY cohort_week)::BIGINT AS cohort_size
  FROM g
)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
       week_offset, n_users, cohort_size,
       (1000000 * n_users // cohort_size)::BIGINT AS retention_micro
FROM w2
"""


QUERIES: dict[str, tuple] = {
    "events_retention_cohorts": (retention_cohorts, RETENTION_SQL),
}
