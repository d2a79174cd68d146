"""Log-bucket quantile sketch — semantics beyond the driver's hash
gate: exact bit-length bucketing, mergeability, and the factor-2
quantile error bound the bucket width guarantees."""

from __future__ import annotations

import bisect

from pyspark.sql import functions as F

from paper2llm_spark.operators.webquantile import (
    quantile_buckets, quantile_buckets_frame,
)

SF = "/root/testdata/sf0.001"


def _sketch(spark, values: list[int]):
    df = spark.createDataFrame([(v,) for v in values], "v long")
    return sorted(
        quantile_buckets_frame(df).collect(), key=lambda r: r.bucket
    )


def test_bucket_boundaries_exact(spark):
    # powers of two sit at the LOW edge of their bucket; 2^k - 1 at the
    # HIGH edge of the previous one — the floating-log failure case
    rows = _sketch(spark, [1, 2, 3, 4, 7, 8, 1023, 1024])
    by_bucket = {r.bucket: r for r in rows}
    assert by_bucket[0].n_docs == 1            # [1]
    assert by_bucket[1].n_docs == 2            # [2, 3]
    assert by_bucket[2].n_docs == 2            # [4, 7]
    assert by_bucket[3].n_docs == 1            # [8]
    assert by_bucket[9].n_docs == 1            # [1023]
    assert by_bucket[10].n_docs == 1           # [1024]
    for r in rows:
        assert r.lo == 2 ** r.bucket and r.hi == 2 ** (r.bucket + 1) - 1


def test_zero_and_negative_clamped_to_bucket0(spark):
    rows = _sketch(spark, [0, 1])
    assert len(rows) == 1 and rows[0].bucket == 0 and rows[0].n_docs == 2


def test_cdf_staircase_monotone(spark):
    rows = _sketch(spark, list(range(1, 300)))
    cum = [r.cum_docs for r in rows]
    assert cum == sorted(cum) and cum[-1] == 299
    assert all(
        a.cum_docs + b.n_docs == b.cum_docs
        for a, b in zip(rows, rows[1:])
    )


def test_merge_by_addition(spark):
    a, b = list(range(1, 200)), list(range(100, 500))
    whole = {r.bucket: r.n_docs for r in _sketch(spark, a + b)}
    half1 = {r.bucket: r.n_docs for r in _sketch(spark, a)}
    half2 = {r.bucket: r.n_docs for r in _sketch(spark, b)}
    merged: dict[int, int] = {}
    for h in (half1, half2):
        for k, v in h.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == whole


def test_quantile_estimate_within_factor_two(spark):
    rows = sorted(
        quantile_buckets(spark, SF).collect(), key=lambda r: r.bucket
    )
    import duckdb

    exact = duckdb.connect().execute(
        f"SELECT quantile_disc(greatest(n_chars,1), 0.5) "
        f"FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    total = rows[-1].cum_docs
    cums = [r.cum_docs for r in rows]
    i = bisect.bisect_left(cums, (total + 1) // 2)
    lo, hi = rows[i].lo, rows[i].hi
    assert lo <= exact <= hi  # true median inside the located bucket
    assert hi < 2 * lo + 2    # bucket width == the factor-2 bound
