"""Stateful streaming sessionization via ``applyInPandasWithState``.

The custom-stateful-operator leg of the streaming story (SURVEY.md
§2.10): gap-based sessions (same 30-minute rule as the batch operator
``webstats.sessionize``) computed incrementally over an unbounded
stream. Per-user state is one tiny tuple (open-session aggregates); a
session closes either when a later event for the same user arrives past
the gap, or when the EVENT-TIME watermark passes the open session's
last event + gap (the timeout path — without it, a user who never
returns would hold state forever).

Closed sessions are append-emitted exactly once and — for in-order
input — match the batch ``sessionize_frame`` rows bit-for-bit
(asserted in tests/test_streaming_stateful.py), including the exact
bigint micro-unit value sums.

Scale shape: state is hash-partitioned by user_id (the same single
exchange the batch window uses), bounded by (active users x 1 tuple),
and expired by the watermark — the operator the brief names
``applyInPandasWithState`` exists precisely because this incremental
shape cannot be expressed with built-in windowed aggregation.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MS = 30 * 60 * 1000
# gap closure compares event times at FULL microsecond precision — the
# batch operator's `ts - prev > INTERVAL 30 MINUTE` is µs-exact, and the
# two must agree bit-for-bit. Only the TIMEOUT runs at ms granularity,
# because Spark's event-time watermark itself is milliseconds.
SESSION_GAP_US = SESSION_GAP_MS * 1000

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start", T.TimestampNTZType()),
        T.StructField("session_end", T.TimestampNTZType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

# (session_id, n_events, start_us, end_us, sum_value_micro)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("sum_micro", T.LongType()),
    ]
)


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1_000)


def _row(user_id: int, sess: tuple) -> pd.DataFrame:
    session_id, n_events, start_us, end_us, sum_micro = sess
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_id": [session_id],
            "n_events": [n_events],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(end_us, unit="us")],
            "sum_value": [sum_micro / 1_000_000.0],
        }
    )


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # watermark passed last event + gap: the open session is final
        yield _row(user_id, state.get)
        state.remove()
        return

    import math

    sess = state.get if state.exists else None
    events = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    for ts, value in zip(events["ts"], events["value"]):
        ts_us = _us(ts)
        micro = int(math.floor(value * 1_000_000 + 0.5))
        if sess is None:
            sess = (1, 1, ts_us, ts_us, micro)
        elif ts_us - sess[3] > SESSION_GAP_US:
            yield _row(user_id, sess)
            sess = (sess[0] + 1, 1, ts_us, ts_us, micro)
        else:
            sess = (sess[0], sess[1] + 1, sess[2], ts_us, sess[4] + micro)
    state.update(sess)
    state.setTimeoutTimestamp(sess[3] // 1000 + SESSION_GAP_MS)


def sessionize_stream(events: DataFrame, *, watermark: str = "0 seconds") -> DataFrame:
    """Streaming frame of CLOSED sessions (append mode).

    ``events`` must carry (event_id, ts, user_id, value); the watermark
    drives both late-event dropping and session timeouts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def start_sessionize(
    spark,
    input_dir: str,
    *,
    query_name: str = "stream_sessions",
    max_files_per_trigger: int = 1,
):
    """File-source stream -> stateful sessions -> in-memory append sink
    (one micro-batch per input file so watermark/timeouts advance the
    way a growing directory actually advances them)."""
    from .windows import EVENTS_SCHEMA

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    from .state import state_partitions

    # per-user session state: size state stores to live-key volume,
    # not the session's batch shuffle width (streaming/state.py)
    with state_partitions(spark):
        return (
            sessionize_stream(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )
