"""Event-type transition matrix — the first-order Markov model of
user journeys (the session-flow analysis every product-analytics
stack ships; Norris 1997 for the chain formalism; in pipeline terms
the behavioral twin of `events_sessionize`'s structural cut).
Answers "after a user does X, what do they do next?" — the table
funnels, churn models and next-event baselines all start from.

Semantics (frozen): per user, events ordered by ``(ts, event_id)``
(the frozen tiebreak — timestamps can collide); each consecutive
pair contributes one ``(prev_type, next_type)`` transition (no
session windowing — the unconditional chain; compose with
`events_sessionize` for within-session transitions).  Cell:
``n`` transitions and the row-normalized
``prob_micro = n * 1e6 div row_total`` (the MLE transition
probability in exact micro-units).

Plan shape (the scale story): ONE corpus-sized exchange — the
hashpartitioning(user_id) lag window (rows are
(user_id, ts, event_id, type) — `value`/`props` pruned); the
``groupBy(prev, next)`` collapse is map-side-combinable into
|types|^2 short rows and the row totals are a window over that
bounded cell table.  Zero joins, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def markov_transitions_frame(events: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id", "ts", "event_id", "event_type"
    ).select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    cells = seq.groupBy("prev_type", "next_type").agg(
        F.count("*").cast("bigint").alias("n")
    )
    return cells.select(
        "prev_type",
        "next_type",
        "n",
        F.expr(f"n * {MICRO} div sum(n) over (partition by prev_type)")
        .cast("bigint")
        .alias("prob_micro"),
    )


def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return markov_transitions_frame(events)


MARKOV_SQL = f"""
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events
),
cells AS (
  SELECT prev_type, next_type, count(*)::BIGINT AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       (n * {MICRO} // sum(n) OVER (PARTITION BY prev_type))::BIGINT
         AS prob_micro
FROM cells
"""


QUERIES: dict[str, tuple] = {
    "events_markov_transitions": (markov_transitions, MARKOV_SQL),
}
