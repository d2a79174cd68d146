"""Benford profile — hand-computed chi, leading-zero screening, and
planted-source separation."""

from __future__ import annotations

from paper2llm_spark.operators.webbenford import (
    BENFORD_MILLI, benford_frame, benford_profile,
)


def _chi(counts: dict[int, int]) -> int:
    n = sum(counts.values())
    out = 0
    for d in range(1, 10):
        e = BENFORD_MILLI[d - 1]
        diff = 1000 * counts.get(d, 0) - e * n
        out += diff * diff // (e * n)
    return out


def test_first_digit_extraction_and_chi(spark):
    df = spark.createDataFrame(
        [(0, "s", "price 10 then 23 and 5, 5 more, 900!")],
        "doc_id long, source string, text string",
    )
    got = benford_frame(df).collect()[0]
    assert got.n_numbers == 5
    assert got.top_digit == 5                 # digit 5 occurs twice
    assert got.chi_milli == _chi({1: 1, 2: 1, 5: 2, 9: 1})


def test_leading_zero_runs_are_screened(spark):
    df = spark.createDataFrame(
        [(0, "s", "code 007 but value 12")],
        "doc_id long, source string, text string",
    )
    got = benford_frame(df).collect()[0]
    assert (got.n_numbers, got.top_digit) == (1, 1)


def test_digitless_sources_emit_nothing(spark):
    df = spark.createDataFrame(
        [(0, "s", "no numbers here at all")],
        "doc_id long, source string, text string",
    )
    assert benford_frame(df).collect() == []


def test_planted_sources_separate(spark):
    rows = {r.source: r for r in
            benford_profile(spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == {"benford100", "uniform9"}
    assert rows["benford100"].chi_milli * 5 < rows["uniform9"].chi_milli
    assert rows["benford100"].top_digit == 1
