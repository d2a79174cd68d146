"""CUSUM burst detection over event streams (Page, Biometrika 1954 —
the sequential change-point chart).  Crawl telemetry needs exactly
this shape: a host that starts spewing generated pages, a scraper
loop hammering one endpoint, an error-rate regression — all are RATE
INCREASES against a baseline, and CUSUM is the classic optimal
detector for them (it accumulates evidence, so it catches sustained
small shifts that per-hour thresholds miss).

Semantics (frozen, all exact integers): per ``event_type``, events
collapse to HOURLY counts on a DENSE hour spine from the stream's
first to last hour (missing hours count 0 — without them the chart
never drains).  Reference value ``k`` = per-type mean rate plus a
1.5-event allowance, in milli-units: ``k_milli = total*1000 div
n_hours + 1500``.  The recursion ``S_t = max(0, S_{t-1} + x_t*1000 -
k_milli)`` is computed WITHOUT sequential state via the reflection
identity ``S_t = P_t - min(0, min_{j<=t} P_j)`` (P = prefix sum of
the deviations) — two running windows replace the unparallelizable
fold.  Alarm iff ``S_t > H_MILLI`` (h = 8 events; tuned on the
fixture so the four unplanted streams raise ZERO alarms while the
planted burst raises dozens — separation, not sensitivity, is what
the gate certifies).  The burst
polarity is PLANTED in-engine as a CONCENTRATED excess (a uniform
thinning would vanish into the mean): every 'click' event on day 2
of the stream re-enters 9 extra times, a one-day 10x rate spike that
crosses the threshold at every fixture scale while the four
unplanted streams stay at zero alarms.  Output per (type,
hour): ``(event_type, hour_idx, n_events, cusum_milli, alarm)``.

Plan shape (the scale story): the hourly groupBy is the ONE
event-scale exchange (map-side combinable, 24-byte rows); the spine
is |types| x |hours| rows built from a 1-row-per-type min/max agg;
both CUSUM windows and the per-type constants share the SAME
partitionBy(event_type) exchange.  At 10^12 events the shuffle is
|types| x |hours| regardless of event count.  Zero Python, zero
corpus joins (plan-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

H_MILLI = 8_000
ALLOWANCE_MILLI = 1_500
PLANT_DAY = 2
PLANT_COPIES = 9


def cusum_frame(events: DataFrame) -> DataFrame:
    """(event_type, ts) -> per dense hour CUSUM chart."""
    hours = events.select(
        "event_type",
        F.expr("unix_timestamp(ts) div 3600").alias("h"),
    )
    counts = hours.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    span = counts.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1"),
        F.sum("n").alias("total"),
    )
    spine = span.select(
        "event_type", "total",
        (F.col("h1") - F.col("h0") + 1).alias("n_hours"),
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h"),
    )
    dense = spine.join(counts, ["event_type", "h"], "left").select(
        "event_type", "h",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        F.expr(
            f"total * 1000 div n_hours + {ALLOWANCE_MILLI}"
        ).alias("k_milli"),
    )
    wp = Window.partitionBy("event_type").orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pref = dense.select(
        "event_type", "h", "n",
        F.sum(F.col("n") * 1000 - F.col("k_milli")).over(wp).alias("p"),
    )
    cum = pref.select(
        "event_type", "h", "n", "p",
        F.min("p").over(wp).alias("pmin"),
    )
    return cum.select(
        F.col("event_type"),
        F.col("h").alias("hour_idx"),
        F.col("n").alias("n_events"),
        (F.col("p") - F.least(F.lit(0), F.col("pmin")))
        .cast("bigint").alias("cusum_milli"),
        (
            F.col("p") - F.least(F.lit(0), F.col("pmin")) > H_MILLI
        ).alias("alarm"),
    )


def cusum_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "ts"
    )
    burst = (
        ev.filter(
            (F.col("event_type") == "click")
            & (F.dayofmonth("ts") == PLANT_DAY)
        )
        .select(
            "event_type", "ts",
            F.explode(
                F.sequence(F.lit(1), F.lit(PLANT_COPIES))
            ).alias("_k"),
        )
        .select("event_type", "ts")
    )
    return cusum_frame(
        ev.select("event_type", "ts").unionByName(burst)
    )


CUSUM_SQL = f"""
WITH ev AS (
  SELECT event_type, ts FROM events
  UNION ALL
  SELECT event_type, ts
  FROM events, unnest(range(1, {PLANT_COPIES} + 1)) AS _k
  WHERE event_type = 'click' AND day(ts) = {PLANT_DAY}
),
hours AS (SELECT event_type,
                 floor(epoch(ts))::BIGINT // 3600 AS h FROM ev),
counts AS (SELECT event_type, h, count(*)::BIGINT AS n
           FROM hours GROUP BY 1, 2),
span AS (SELECT event_type, min(h) AS h0, max(h) AS h1,
                sum(n)::BIGINT AS total
         FROM counts GROUP BY 1),
spine AS (
  SELECT event_type, total, (h1 - h0 + 1)::BIGINT AS n_hours,
         unnest(range(h0, h1 + 1)) AS h
  FROM span
),
dense AS (
  SELECT s.event_type, s.h,
         coalesce(c.n, 0)::BIGINT AS n,
         (s.total * 1000 // s.n_hours + {ALLOWANCE_MILLI}) AS k_milli
  FROM spine s LEFT JOIN counts c
    ON c.event_type = s.event_type AND c.h = s.h
),
pref AS (
  SELECT event_type, h, n,
         sum(n * 1000 - k_milli)
           OVER (PARTITION BY event_type ORDER BY h
                 ROWS UNBOUNDED PRECEDING) AS p
  FROM dense
),
cum AS (
  SELECT event_type, h, n, p,
         min(p) OVER (PARTITION BY event_type ORDER BY h
                      ROWS UNBOUNDED PRECEDING) AS pmin
  FROM pref
)
SELECT event_type, h AS hour_idx, n AS n_events,
       (p - least(0, pmin))::BIGINT AS cusum_milli,
       (p - least(0, pmin) > {H_MILLI}) AS alarm
FROM cum
"""


QUERIES: dict[str, tuple] = {
    "events_cusum_anomaly": (cusum_anomaly, CUSUM_SQL),
}
