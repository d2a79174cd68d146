"""Watermarked windowed aggregation + applyInPandasWithState sessions.

File-source streams with one micro-batch per file (mtimes pinned so the
source drains them in order), so the event-time watermark advances
between files exactly like a growing crawl directory advances it.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from paper2llm_spark.streaming.sessions import start_sessionize
from paper2llm_spark.streaming.windows import start_windowed_counts


def _ts(hour: int, minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, hour, minute, 0)


def _write_events(rows, path: str, mtime: int) -> None:
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    pq.write_table(table, path)
    os.utime(path, (mtime, mtime))


def test_windowed_counts_emit_once_and_drop_late(spark, tmp_path):
    d = tmp_path / "win_in"
    d.mkdir()
    # file 1: four events in window 10:00-10:05 plus a 10:20 event that
    # pushes the watermark to 10:10 (closing the 10:00 window next batch)
    _write_events(
        [
            (1, _ts(10, 0), 1, "view", 1.0),
            (2, _ts(10, 1), 1, "view", 2.0),
            (3, _ts(10, 3), 2, "view", 3.0),
            (4, _ts(10, 4), 2, "click", 0.5),
            (5, _ts(10, 20), 3, "view", 10.0),
        ],
        str(d / "f1.parquet"),
        1_000_000_000,
    )
    # file 2: 10:40 event -> batch 1 runs with watermark 10:10, which
    # finalizes + emits the 10:00-10:05 window and moves the mark to 10:30
    _write_events(
        [(7, _ts(10, 40), 3, "view", 7.0)],
        str(d / "f2.parquet"),
        1_000_000_100,
    )
    # file 3: a LATE event for the already-finalized 10:00 window (the
    # watermark contract: once a window's state is evicted, later rows
    # for it are dropped, never re-emitted) plus a far-future flusher
    _write_events(
        [
            (6, _ts(10, 1), 9, "view", 100.0),  # late -> dropped
            (8, _ts(12, 0), 3, "view", 0.0),
        ],
        str(d / "f3.parquet"),
        1_000_000_200,
    )

    q = start_windowed_counts(spark, str(d), query_name="win_t1")
    q.awaitTermination(180)

    collected = spark.table("win_t1").collect()
    rows = {(r["win_start"], r["event_type"]): r for r in collected}
    # exactly one row per (window, type): the late event neither created
    # a duplicate emission of the finalized window nor updated it
    assert len(collected) == len(rows)
    r = rows[(_ts(10, 0), "view")]
    assert r["n_events"] == 3 and r["sum_value"] == 6.0
    assert rows[(_ts(10, 0), "click")]["n_events"] == 1
    # the 10:20 window flushed once the watermark passed it
    assert rows[(_ts(10, 20), "view")]["n_events"] == 1
    # windows the watermark never passed are not emitted (append
    # semantics: nothing provisional ever reaches the sink)
    assert (_ts(12, 0), "view") not in rows


def test_stateful_sessions_close_by_gap_and_timeout(spark, tmp_path):
    d = tmp_path / "sess_in"
    d.mkdir()
    # file 1: user 1 two events (one session), user 2 one event
    _write_events(
        [
            (1, _ts(10, 0), 1, "view", 1.25),
            (2, _ts(10, 10), 1, "view", 2.0),
            (3, _ts(10, 0), 2, "view", 5.0),
        ],
        str(d / "f1.parquet"),
        1_000_000_000,
    )
    # file 2: user 1 returns past the gap -> session 1 closes inline;
    # watermark after this batch = 11:00
    _write_events(
        [(4, _ts(11, 0), 1, "view", 4.0)],
        str(d / "f2.parquet"),
        1_000_000_100,
    )
    # file 3: unrelated user advances processing; user 2's open session
    # (timeout 10:30 < watermark 11:00) must now close via hasTimedOut
    _write_events(
        [(5, _ts(12, 0), 99, "view", 0.0)],
        str(d / "f3.parquet"),
        1_000_000_200,
    )

    q = start_sessionize(spark, str(d), query_name="sess_t1")
    q.awaitTermination(180)

    got = {
        (r["user_id"], r["session_id"]): r
        for r in spark.table("sess_t1").collect()
    }
    # user 1 session 1: closed by the gap when event 4 arrived
    r = got[(1, 1)]
    assert r["n_events"] == 2
    assert r["session_start"] == _ts(10, 0) and r["session_end"] == _ts(10, 10)
    assert r["sum_value"] == 3.25
    # user 2 session 1: closed by event-time TIMEOUT (user never returned)
    r = got[(2, 1)]
    assert r["n_events"] == 1 and r["sum_value"] == 5.0
    # user 1 session 2: the availableNow flush batch carries the final
    # watermark (12:00), past this session's 11:30 timeout -> emitted
    r = got[(1, 2)]
    assert r["n_events"] == 1 and r["session_start"] == _ts(11, 0)
    # user 99's timeout (12:30) is beyond the final watermark: still open
    assert (99, 1) not in got

    # the closed rows match the BATCH sessionizer on the same events
    from paper2llm_spark.operators.webstats import sessionize_frame

    batch = spark.createDataFrame(
        [
            (1, _ts(10, 0), 1, "view", 1.25, ""),
            (2, _ts(10, 10), 1, "view", 2.0, ""),
            (3, _ts(10, 0), 2, "view", 5.0, ""),
        ],
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string",
    )
    expect = {
        (r["user_id"], r["session_id"]): r
        for r in sessionize_frame(batch).collect()
    }
    for key, exp in expect.items():
        assert got[key]["n_events"] == exp["n_events"]
        assert got[key]["sum_value"] == exp["sum_value"]
