"""Seasonal-naive forecast baseline + error ledger — predict each
hour's event count with the count 24 hours earlier and score it
(the "seasonal naive" baseline of the forecasting literature —
Hyndman & Athanasopoulos, *Forecasting: Principles and Practice*
§5.2 — the bar every anomaly detector and capacity model must
beat; the forecasting member of the audit family).

Semantics (frozen): dense hourly grid per event type over the
corpus-wide ``[min_hour, max_hour]`` epoch-hour range (missing
hours COUNT AS ZERO — an inner join on observed hours would bias
the error toward busy hours); prediction for hour h is the count
at ``h - 24``; the first 24 hours have no prediction and are
excluded.  Per event type:

* ``n_hours``      — scored horizon length
* ``total_actual`` — exact event count over the horizon
* ``mae_micro = sum|actual - pred| * 1e6 div n_hours`` —
  nonnegative, so integer division is engine-identical
* ``sum_err``      — signed total error, kept as an EXACT integer
  (never divided — the signed-division trap has no guard as good
  as not dividing)

Plan shape (the scale story): ONE corpus-sized exchange — the
map-side-combinable ``groupBy(event_type, hour)``; the dense grid
is |types| x |hours| generated rows (sequence explode over a
1-row broadcast range), counts re-enter by left join on the
collapsed table, and the 24-hour shift is a self-join of that
same small grid (broadcast).  Zero Python; props/value pruned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MICRO = 1_000_000
PERIOD_H = 24


def seasonal_naive_frame(events: DataFrame) -> DataFrame:
    # field arithmetic, not unix_timestamp: ts is TIMESTAMP_NTZ and
    # epoch conversion would drag the session timezone into the hour id
    hours = events.select(
        "event_type",
        F.expr(
            "cast(datediff(cast(ts as date), date'1970-01-01') as bigint)"
            " * 24 + hour(ts)"
        ).alias("hour"),
    )
    counts = hours.groupBy("event_type", "hour").agg(
        F.count("*").cast("bigint").alias("c")
    )
    rng = hours.agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    types = counts.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(rng)).select(
        "event_type",
        F.explode(F.expr("sequence(h0, h1)")).alias("hour"),
    )
    dense = grid.join(
        F.broadcast(counts), ["event_type", "hour"], "left"
    ).select(
        "event_type", "hour", F.coalesce("c", F.lit(0)).alias("c")
    )
    pred = dense.select(
        "event_type",
        (F.col("hour") + PERIOD_H).alias("hour"),
        F.col("c").alias("p"),
    )
    scored = dense.join(F.broadcast(pred), ["event_type", "hour"])
    return scored.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_hours"),
        F.sum("c").cast("bigint").alias("total_actual"),
        F.expr(f"sum(abs(c - p)) * {MICRO} div count(*)")
        .cast("bigint").alias("mae_micro"),
        F.sum(F.col("c") - F.col("p")).cast("bigint").alias("sum_err"),
    )


def seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return seasonal_naive_frame(events)


SEASONAL_NAIVE_SQL = f"""
WITH hours AS (
  SELECT event_type,
         (date_diff('day', DATE '1970-01-01', ts::DATE) * 24
          + hour(ts))::BIGINT AS hour
  FROM events
),
counts AS (
  SELECT event_type, hour, count(*)::BIGINT AS c
  FROM hours GROUP BY 1, 2
),
rng AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM hours),
grid AS (
  SELECT t.event_type, g.hour
  FROM (SELECT DISTINCT event_type FROM counts) t,
       (SELECT unnest(range(h0, h1 + 1)) AS hour FROM rng) g
),
dense AS (
  SELECT g.event_type, g.hour, coalesce(c.c, 0)::BIGINT AS c
  FROM grid g LEFT JOIN counts c USING (event_type, hour)
),
scored AS (
  SELECT a.event_type, a.c, p.c AS p
  FROM dense a JOIN dense p
    ON p.event_type = a.event_type AND p.hour = a.hour - {PERIOD_H}
)
SELECT event_type,
       count(*)::BIGINT AS n_hours,
       sum(c)::BIGINT AS total_actual,
       (sum(abs(c - p)) * {MICRO} // count(*))::BIGINT AS mae_micro,
       sum(c - p)::BIGINT AS sum_err
FROM scored GROUP BY 1
"""


QUERIES: dict[str, tuple] = {
    "events_seasonal_naive": (seasonal_naive, SEASONAL_NAIVE_SQL),
}
