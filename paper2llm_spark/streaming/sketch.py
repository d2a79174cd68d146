"""Streaming sketch merge — per-window HyperLogLog registers over an
unbounded event stream: "distinct users per 5-minute window" at a
scale where exact per-window ``COUNT(DISTINCT)`` state would hold
every user id ever seen in the horizon.

This is the sketch-under-state composition the batch HLL operator
(``operators/websketch.py``) exists to feed: HLL registers merge by
``max`` per bucket, and ``max`` is exactly the kind of associative,
bounded-size aggregate Structured Streaming's state store handles —
per (window, bucket) state is ONE bigint, so a window's state is at
most ``HLL_STREAM_M`` rows no matter how many events or distinct
users it sees (the exact-distinct alternative's state grows with
cardinality).  Same watermark contract as the windowed counts
(``streaming/windows.py``): append mode, a window emits once when the
watermark passes its end, then its state is evicted.

Exactness: register contents are pure integer functions of md5
(``bucket = h mod m``; rank = leading-zero count of the remaining 54
bits via minimal-binary-string length — no float anywhere), so the
fully drained ``availableNow`` run equals the batch aggregate
bit-for-bit and the DuckDB dual is a REAL value-hash gate.  The float
estimator (harmonic mean + linear counting) stays driver-side in the
tests, asserted against true per-window distinct counts within the
published ``1.04/sqrt(m)`` band.

At 10^12 events: shuffle-partitioned on (window, bucket); every
partition ships bounded register partials (map-side max combine), and
cross-day / cross-source union is the same ``max`` merge over the
emitted register tables — the reason registers, not estimates, are
the stored form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import portable_hash60

HLL_STREAM_M = 64   # registers per window; sigma = 1.04/sqrt(64) = 13%
_REM_BITS = 54      # 60-bit hash minus log2(m) bucket bits


def windowed_hll_registers(
    events: DataFrame,
    *,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window HLL registers over user_id.

    Works on a streaming OR batch frame (watermark is a no-op in
    batch — the testable-dual trick used across the package)."""
    hv = portable_hash60(F.col("user_id").cast("string")).alias("hv")
    base = events.withWatermark("ts", watermark).select("ts", hv)
    rem = F.expr(f"hv div {HLL_STREAM_M}")
    r = base.select(
        "ts",
        (F.col("hv") % HLL_STREAM_M).cast("bigint").alias("bucket"),
        F.when(rem == 0, F.lit(_REM_BITS + 1))
        .otherwise(_REM_BITS + 1 - F.length(F.bin(rem)))
        .cast("bigint")
        .alias("rank"),
    )
    agg = r.groupBy(F.window("ts", window), "bucket").agg(
        F.max("rank").cast("bigint").alias("max_rank")
    )
    return agg.select(
        F.col("window.start").cast("timestamp_ntz").alias("win_start"),
        F.col("window.end").cast("timestamp_ntz").alias("win_end"),
        "bucket",
        "max_rank",
    )


def start_windowed_hll(
    spark,
    input_dir: str,
    *,
    query_name: str = "windowed_hll",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    max_files_per_trigger: int = 64,
):
    """File-source stream -> watermarked per-window HLL registers ->
    in-memory append sink."""
    from .windows import EVENTS_SCHEMA

    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    out = windowed_hll_registers(src, window=window, watermark=watermark)
    from .state import state_partitions

    # sketch state is (windows x registers) rows — size state stores
    # to that, not the batch shuffle width (streaming/state.py)
    with state_partitions(spark):
        return (
            out.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )


def hll_estimate(max_ranks: list[int], m: int = HLL_STREAM_M) -> float:
    """Driver-side HLL estimator (Flajolet et al. 2007): harmonic mean
    with the m=64 bias constant, linear counting for the small range.
    ``max_ranks`` holds the non-empty registers only (the emitted
    rows); absent registers count as rank 0."""
    import math

    alpha = 0.709  # published constant for m >= 64
    zeros = m - len(max_ranks)
    s = zeros * 1.0 + sum(2.0 ** -r for r in max_ranks)
    est = alpha * m * m / s
    if est <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return est


# ---------------------------------------------------------------------------
# Count-Min counters under streaming state (heavy-hitter shape)
# ---------------------------------------------------------------------------

CMS_STREAM_D = 4   # depth (independent hash rows)
CMS_STREAM_W = 64  # width; state per window = d*w = 256 bigint rows

# Count-Min is the OTHER half of the sketch-under-state pair: counters
# merge by SUM per (row, bucket) — associative, bounded — so per-window
# heavy-hitter queries ("which users dominate this 5-minute window")
# never hold a per-user count table in state.  Counter contents are
# pure integer md5 bucket sums (the websketch.py seeding discipline),
# so the drained availableNow run equals the batch aggregate
# bit-for-bit and the DuckDB dual is a REAL value-hash gate; the
# estimator (min over d rows, never under-counts, over-count bounded
# by e/w per row) stays driver-side in the tests.


def windowed_cms_counters(
    events: DataFrame,
    *,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window Count-Min counters over user_id.

    Works on a streaming OR batch frame (watermark is a no-op in
    batch — the testable-dual trick used across the package)."""
    base = events.withWatermark("ts", watermark).select(
        "ts", F.col("user_id").cast("string").alias("k")
    )
    pairs = F.array(*[
        F.struct(
            F.lit(j).cast("bigint").alias("row_idx"),
            (
                portable_hash60(F.concat(F.lit(f"cms{j}:"), F.col("k")))
                % CMS_STREAM_W
            ).cast("bigint").alias("bucket"),
        )
        for j in range(CMS_STREAM_D)
    ])
    r = base.select("ts", F.explode(pairs).alias("p")).select(
        "ts", "p.row_idx", "p.bucket"
    )
    agg = r.groupBy(F.window("ts", window), "row_idx", "bucket").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    return agg.select(
        F.col("window.start").cast("timestamp_ntz").alias("win_start"),
        F.col("window.end").cast("timestamp_ntz").alias("win_end"),
        "row_idx",
        "bucket",
        "cnt",
    )


def start_windowed_cms(
    spark,
    input_dir: str,
    *,
    query_name: str = "windowed_cms",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    max_files_per_trigger: int = 64,
):
    """File-source stream -> watermarked per-window CMS counters ->
    in-memory append sink."""
    from .windows import EVENTS_SCHEMA

    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    out = windowed_cms_counters(src, window=window, watermark=watermark)
    from .state import state_partitions

    with state_partitions(spark):
        return (
            out.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )


def cms_estimate(counters: dict, key: str, w: int = CMS_STREAM_W,
                 d: int = CMS_STREAM_D) -> int:
    """Driver-side point query: min over the d row counters for key.
    ``counters`` maps (row_idx, bucket) -> cnt; absent cells are 0."""
    import hashlib

    est = None
    for j in range(d):
        h = int(hashlib.md5(f"cms{j}:{key}".encode()).hexdigest()[:15], 16)
        c = counters.get((j, h % w), 0)
        est = c if est is None else min(est, c)
    return est or 0
