"""Stream-stream interval join — the last Structured Streaming join
shape the engine needed (SURVEY.md §2.10 family): attribute each
click to the views it followed within the attribution window, both
sides unbounded streams.  This is the canonical ad-attribution /
impression-click join (the Spark SQL streaming-joins design doc's
motivating example).

Semantics: INNER join on ``user_id`` with the event-time range
predicate ``view_ts <= click_ts <= view_ts + JOIN_WINDOW``.  Inner
stream-stream joins emit a pair the moment both sides have arrived —
the watermark never delays or drops OUTPUT; it exists to bound STATE:
with both sides watermarked, Spark derives that a buffered view older
than ``watermark - JOIN_WINDOW`` can never match a future click and
evicts it.  A fully drained ``availableNow`` run therefore equals the
batch join exactly — which is what makes the DuckDB dual a plain
interval self-join (registered in ``__spark_entry__``), a REAL
value-hash gate where the other stateful streaming queries get
rows-only checks.

At scale: state is shuffle-partitioned on ``user_id`` and bounded by
``JOIN_WINDOW + watermark`` per key — the two knobs ARE the memory
budget; without the watermarks Spark would buffer both streams
forever (it warns, and state grows unboundedly).  Corollary of the
state bound: input arriving later than the watermark is dropped
before the join, so a replay must be roughly time-ordered (a
time-shuffled file replay advances the watermark to ``max(ts)`` after
the first micro-batch and correctly discards the rest —
``tests/test_streaming_joins.py`` pins both behaviors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .state import state_partitions
from .windows import EVENTS_SCHEMA

JOIN_WINDOW = "60 minutes"   # attribution horizon
WATERMARK = "60 minutes"     # late-data bound on both sides


def interval_join_frame(views_src: DataFrame, clicks_src: DataFrame) -> DataFrame:
    """view->click attribution pairs; works on streaming AND batch
    frames (watermarks are no-ops in batch — the testable-dual trick
    used across the streaming package)."""
    views = views_src.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        "user_id",
    ).withWatermark("view_ts", WATERMARK)
    clicks = clicks_src.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("user_id").alias("click_user"),
    ).withWatermark("click_ts", WATERMARK)
    j = views.join(
        clicks,
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts")
           <= F.col("view_ts") + F.expr(f"interval {JOIN_WINDOW}")),
        "inner",
    )
    return j.select(
        "user_id", "view_id", "click_id", "view_ts", "click_ts",
        (F.unix_millis("click_ts") - F.unix_millis("view_ts"))
        .cast("bigint").alias("lag_ms"),
    )


def start_interval_join(
    spark: SparkSession,
    in_dir: str,
    *,
    query_name: str,
    max_files_per_trigger: int = 64,
):
    """availableNow drain of the staged events dir through the
    stream-stream join into a memory sink."""
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_dir)
    )
    out = interval_join_frame(src, src)
    # a stream-stream join keeps FOUR state stores per partition —
    # size them to state volume, not the session's batch shuffle width
    # (measured 47 s -> 6-10 s at sf0.1; see streaming/state.py)
    with state_partitions(spark):
        return (
            out.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
