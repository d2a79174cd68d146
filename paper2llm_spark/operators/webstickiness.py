"""Engagement stickiness — WAU/MAU per week (the DAU/MAU ratio
family every growth dashboard leads with; popularized as the
"stickiness" metric in consumer-product analytics, here on the
weekly grid the events fixture supports: WAU over a trailing
4-week MAU).

Semantics (frozen): Monday-epoch integer weeks over the SAME
hash-sparsified (user, week) activity grid as
`events_lifecycle_states` / `events_cohort_ltv` (cells with
``(user_id*31 + week) % 5 == 0`` dropped — every fixture user is
otherwise active every week and the ratio would be constant 1.0;
one shared rule keeps the engagement ledgers consistent);
``wau_w`` = distinct users active in week w; ``mau_w`` =
distinct users active in weeks ``[w-3, w]``; output one row per
week PRESENT in the data with
``stickiness_micro = wau * 1e6 div mau``.  MAU membership is
computed by forward-expansion — each (user, week) cell votes for
target weeks ``week..week+3`` — restricted to weeks that exist
(frozen; no phantom trailing weeks).

Plan shape (the scale story): ONE corpus-sized exchange — the
map-side-combinable distinct on (user_id, week); the 4x expansion
runs on that collapsed grid (|users|x|weeks| short rows), both
counts are map-side-combinable distinct aggregates per week, and
the week-universe join is a broadcast of |weeks| rows.  Zero
Python; props/value/event_type never read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .weblifecycle import WEEK_EPOCH

MICRO = 1_000_000
MAU_WEEKS = 4


def stickiness_frame(events: DataFrame) -> DataFrame:
    grid = events.select(
        "user_id",
        F.expr(
            f"cast(datediff(cast(ts as date), date'{WEEK_EPOCH}') div 7"
            f" as bigint)"
        ).alias("week"),
    ).distinct().filter(F.expr("(user_id * 31 + week) % 5 != 0"))
    weeks = grid.select("week").distinct()
    wau = grid.groupBy("week").agg(
        F.count("*").cast("bigint").alias("wau")
    )
    votes = grid.select(
        "user_id",
        F.explode(
            F.expr(f"sequence(week, week + {MAU_WEEKS - 1})")
        ).alias("week"),
    ).distinct()
    mau = (
        votes.join(F.broadcast(weeks), "week")
        .groupBy("week")
        .agg(F.count("*").cast("bigint").alias("mau"))
    )
    return (
        wau.join(mau, "week")
        .select(
            "week",
            "wau",
            "mau",
            F.expr(f"wau * {MICRO} div mau").cast("bigint")
            .alias("stickiness_micro"),
        )
    )


def stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return stickiness_frame(events)


STICKINESS_SQL = f"""
WITH grid AS (
  SELECT * FROM (
    SELECT DISTINCT user_id,
           (date_diff('day', DATE '{WEEK_EPOCH}', ts::DATE) // 7)::BIGINT
             AS week
    FROM events
  ) WHERE (user_id * 31 + week) % 5 != 0
),
weeks AS (SELECT DISTINCT week FROM grid),
wau AS (SELECT week, count(*)::BIGINT AS wau FROM grid GROUP BY 1),
votes AS (
  SELECT DISTINCT user_id, week + k AS week
  FROM grid, (SELECT unnest(range(0, {MAU_WEEKS})) AS k)
),
mau AS (
  SELECT v.week, count(*)::BIGINT AS mau
  FROM votes v JOIN weeks w USING (week)
  GROUP BY 1
)
SELECT week, wau.wau, mau.mau,
       (wau.wau * {MICRO} // mau.mau)::BIGINT AS stickiness_micro
FROM wau JOIN mau USING (week)
"""


QUERIES: dict[str, tuple] = {
    "events_stickiness": (stickiness, STICKINESS_SQL),
}
