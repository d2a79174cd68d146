"""Watermarked windowed aggregation over a growing events stream.

The late-data half of the streaming story (SURVEY.md §2.10): tumbling
event-time windows with a watermark, append output mode — a window is
emitted exactly once, when the watermark passes its end. Spark's
watermark contract (asserted in tests/test_streaming_stateful.py): a
row later than the watermark may still merge while its window's state
is live, but once the watermark finalizes a window the state is
evicted and later rows for it are DROPPED — an emitted window is never
updated or re-emitted.
This is the streaming twin of the batch ``rel_events_hourly`` rollup:
same grouping, same exact bigint micro-unit value sums, so a drained
stream with no late data matches the batch aggregate bit-for-bit.

At scale this runs shuffle-partitioned on (window, event_type) with
per-partition state bounded by the watermark horizon — the watermark is
what keeps 10^12-event state finite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        # watermarks require TimestampType (LTZ); the session timezone is
        # pinned to UTC, so naive event times pass through unshifted and
        # the OUTPUT window bounds are cast back to NTZ for the dual
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def windowed_event_counts(
    events: DataFrame,
    *,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts + exact value sums per event_type.

    Works on a streaming OR batch frame (watermark is a no-op in batch,
    which is what makes the batch dual testable)."""
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            (
                F.sum(F.floor(F.col("value") * 1000000 + F.lit(0.5)))
                / F.lit(1000000.0)
            ).alias("sum_value"),
        )
    )
    return agg.select(
        F.col("window.start").cast("timestamp_ntz").alias("win_start"),
        F.col("window.end").cast("timestamp_ntz").alias("win_end"),
        "event_type",
        "n_events",
        "sum_value",
    )


def start_windowed_counts(
    spark,
    input_dir: str,
    *,
    query_name: str = "windowed_counts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    max_files_per_trigger: int = 1,
):
    """File-source stream -> watermarked windows -> in-memory append sink.

    ``max_files_per_trigger=1`` makes each input file its own
    micro-batch so the watermark advances between files — the unit of
    progress a growing Common-Crawl-style directory actually has.
    Results accumulate in the ``query_name`` in-memory table (tests);
    production swaps the sink for parquet/Kafka with a checkpoint dir.
    """
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    out = windowed_event_counts(stream, window=window, watermark=watermark)
    from .state import state_partitions

    # window-aggregation state is (windows x event_types) rows — size
    # state stores to that, not the batch shuffle width (state.py)
    with state_partitions(spark):
        return (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )
