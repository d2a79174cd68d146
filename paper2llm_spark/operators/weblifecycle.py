"""User lifecycle growth accounting — the new / retained /
resurrected / churned weekly ledger (the "growth accounting" table
Social Capital popularized and every consumer-product analytics
stack ships; state semantics per the standard MAU-accounting
identities).  The behavioral complement of `events_retention_cohorts`
(which fixes a birth cohort; this tracks flows week over week).

Semantics (frozen): ``week = days_since(1970-01-05) div 7`` (a
Monday epoch — integer week ids, engine-identical; no date_trunc
locale surface).  The activity table is SPARSIFIED by dropping
cells where ``(user_id * 31 + week) % 5 == 0`` — the fixture's
users are active every single week, so without planted gaps the
``resurrected`` state and mid-corpus churn would never fire and the
gate would be vacuous (the planting discipline of `webcard`/
`mmdup`).  Over the surviving (user, week) cells, per user ordered
by week:

* first active week            -> ``new``
* active with ``prev = w - 1`` -> ``retained``
* active with ``prev < w - 1`` -> ``resurrected``
* for every active week ``w`` whose NEXT active week is not
  ``w + 1``: one ``churned`` row at ``w + 1`` (capped at the corpus
  max week + 1 — the week the loss is booked, the standard ledger
  convention)

Output per (week, state): ``n`` users.  The accounting identities
``active_t = new + retained + resurrected`` and
``churned_{t+1} = active_t - retained_{t+1}`` hold exactly
(pytest-locked).

Plan shape (the scale story): ONE corpus-sized exchange — the
map-side-combinable distinct on (user_id, week) keyed by user_id —
feeds both lag and lead through a SINGLE hashpartitioning(user_id)
window pass; states and churn rows are projections (churn via the
same lead, no self-join); the final groupBy((week, state)) collapses
to |weeks|x4 cells.  Zero joins except the 1-row max-week
broadcast; zero Python; props/value/event_type never read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

WEEK_EPOCH = "1970-01-05"  # a Monday


def lifecycle_states_frame(events: DataFrame) -> DataFrame:
    weeks = events.select(
        "user_id",
        F.expr(
            f"cast(datediff(cast(ts as date), date'{WEEK_EPOCH}') div 7"
            f" as bigint)"
        ).alias("week"),
    ).distinct().filter(
        F.expr("(user_id * 31 + week) % 5 != 0")
    )
    horizon = weeks.agg(F.max("week").alias("max_week"))
    w = Window.partitionBy("user_id").orderBy("week")
    seq = weeks.select(
        "user_id",
        "week",
        F.lag("week").over(w).alias("prev"),
        F.lead("week").over(w).alias("nxt"),
    ).crossJoin(F.broadcast(horizon))
    states = seq.select(
        "week",
        F.expr(
            "case when prev is null then 'new'"
            " when prev = week - 1 then 'retained'"
            " else 'resurrected' end"
        ).alias("state"),
    )
    churn = seq.filter(
        (F.col("nxt").isNull() | (F.col("nxt") > F.col("week") + 1))
        & (F.col("week") + 1 <= F.col("max_week") + 1)
    ).select(
        (F.col("week") + 1).alias("week"),
        F.lit("churned").alias("state"),
    )
    return (
        states.unionByName(churn)
        .groupBy("week", "state")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def lifecycle_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return lifecycle_states_frame(events)


LIFECYCLE_SQL = f"""
WITH weeks AS (
  SELECT * FROM (
    SELECT DISTINCT user_id,
           (date_diff('day', DATE '{WEEK_EPOCH}', ts::DATE) // 7)::BIGINT
             AS week
    FROM events
  ) WHERE (user_id * 31 + week) % 5 != 0
),
horizon AS (SELECT max(week) AS max_week FROM weeks),
seq AS (
  SELECT user_id, week,
         lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev,
         lead(week) OVER (PARTITION BY user_id ORDER BY week) AS nxt
  FROM weeks
),
states AS (
  SELECT week,
         CASE WHEN prev IS NULL THEN 'new'
              WHEN prev = week - 1 THEN 'retained'
              ELSE 'resurrected' END AS state
  FROM seq
  UNION ALL
  SELECT week + 1 AS week, 'churned' AS state
  FROM seq, horizon
  WHERE (nxt IS NULL OR nxt > week + 1) AND week + 1 <= max_week + 1
)
SELECT week, state, count(*)::BIGINT AS n
FROM states GROUP BY 1, 2
"""


QUERIES: dict[str, tuple] = {
    "events_lifecycle_states": (lifecycle_states, LIFECYCLE_SQL),
}
