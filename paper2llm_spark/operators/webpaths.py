"""Top session paths — the ranked event-sequence table behind every
product-analytics "paths" / Sankey view (Amplitude's Pathfinder,
GA's path exploration; user-journey mining per the WUM literature,
e.g. Spiliopoulou & Faulstich's WUM aggregated log).  "What are the
most common first-five-step journeys?" — the table funnels are
designed from.

Semantics (frozen): sessions via the sessionize lag + running-sum
break in ``(ts, event_id)`` order, but at a ``PATH_GAP = 24``-hour
inactivity gap — the "daily visit" convention: the fixture's median
inter-event gap is ~8 hours (measured), so the 30-minute analytics
rule degenerates to single-event sessions and the path table would
be vacuous; at 24h ~90% of consecutive events chain and the >24h
tail still breaks multiple sessions per user.  Per session the path
string is the first
``PATH_CAP = 5`` event types joined by ``>`` (the cap bounds the
string and the group space — production paths UIs cap exactly
like this; longer sessions contribute their prefix).  Output: the
``TOP_N = 20`` paths by (sessions desc, path asc) with exact
``n_sessions`` and ``share_micro`` of all sessions.

Plan shape (the scale story): ONE corpus-sized exchange — the
hashpartitioning(user_id) session window (props/value pruned); the
ordered per-session collect is bounded by the sort within the same
partitioning, and the cap is applied by ``slice`` BEFORE the path
string exists, so no unbounded string ever materializes; the path
groupBy collapses map-side to |distinct capped paths| rows, the
total re-enters by 1-row broadcast, and the top-N compiles to
TakeOrderedAndProject.  Zero joins, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

PATH_CAP = 5
PATH_GAP_HOURS = 24
TOP_N = 20
MICRO = 1_000_000


def top_paths_frame(ev: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    brk = F.when(
        prev.isNull()
        | ((F.col("ts") - prev) > F.expr(f"INTERVAL '{PATH_GAP_HOURS}' HOUR")),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = ev.select("user_id", "ts", "event_id", "event_type").withColumn(
        "session_id",
        F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = sess.groupBy("user_id", "session_id").agg(
        F.expr(
            f"array_join(slice(transform(array_sort("
            f"collect_list(struct(ts, event_id, event_type))),"
            f" s -> s.event_type), 1, {PATH_CAP}), '>')"
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(
        F.count("*").cast("bigint").alias("n_sessions")
    )
    total = counts.agg(F.sum("n_sessions").cast("bigint").alias("t"))
    ranked = (
        counts.crossJoin(F.broadcast(total))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(TOP_N)
    )
    w2 = Window.orderBy(F.col("n_sessions").desc(), F.col("path").asc())
    return ranked.select(
        F.row_number().over(w2).cast("bigint").alias("rank"),
        "path",
        "n_sessions",
        F.expr(f"n_sessions * {MICRO} div t").cast("bigint")
        .alias("share_micro"),
    )


def top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return top_paths_frame(events)


TOP_PATHS_SQL = f"""
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL {PATH_GAP_HOURS} HOUR
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM seq
),
paths AS (
  SELECT user_id, session_id,
         array_to_string(
           (list(event_type ORDER BY ts, event_id))[1:{PATH_CAP}], '>')
           AS path
  FROM sess GROUP BY 1, 2
),
counts AS (
  SELECT path, count(*)::BIGINT AS n_sessions FROM paths GROUP BY 1
),
total AS (SELECT sum(n_sessions)::BIGINT AS t FROM counts)
SELECT row_number() OVER (ORDER BY n_sessions DESC, path ASC)::BIGINT
         AS rank,
       path, n_sessions,
       (n_sessions * {MICRO} // t)::BIGINT AS share_micro
FROM counts, total
ORDER BY n_sessions DESC, path ASC
LIMIT {TOP_N}
"""


QUERIES: dict[str, tuple] = {
    "events_top_paths": (top_paths, TOP_PATHS_SQL),
}
