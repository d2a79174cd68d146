"""Temperature mixture — semantics beyond the driver's hash gate:
flattening property, extremes, exact replay."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def _py_mix(counts: dict[str, int]):
    sq = {l: math.floor(math.sqrt(n) * 1e6 + 0.5) for l, n in counts.items()}
    n_total, denom = sum(counts.values()), sum(sq.values())
    out = {}
    for l, n in counts.items():
        p = 1_000_000 * n // n_total
        q = 1_000_000 * sq[l] // denom
        out[l] = (n, p, q, 1_000_000 * q // p)
    return out


def _run(spark, counts: dict[str, int]):
    from paper2llm_spark.operators.webtemp import temperature_mix_frame

    rows = [(i, l) for l, n in counts.items() for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    return {
        r["lang"]: (r["n_docs"], r["p_micro"], r["q_micro"],
                    r["boost_micro"])
        for r in temperature_mix_frame(df).collect()
    }


def test_matches_python_replay(spark):
    counts = {"en": 800, "fr": 150, "zh": 45, "haw": 5}
    assert _run(spark, counts) == _py_mix(counts)


def test_flattening_property(spark):
    """T=2 must shrink the head and boost the tail: q < p for the
    largest language, q > p for the smallest; ordering preserved."""
    got = _run(spark, {"en": 900, "fr": 90, "haw": 10})
    assert got["en"][2] < got["en"][1]          # head damped
    assert got["haw"][2] > got["haw"][1]        # tail boosted
    assert got["haw"][3] > 1_000_000 > got["en"][3]
    # still monotone: more docs -> no smaller q
    assert got["en"][2] > got["fr"][2] > got["haw"][2]


def test_uniform_corpus_is_fixed_point(spark):
    """Equal-size languages: temperature does nothing (q == p up to
    integer truncation)."""
    got = _run(spark, {"a": 100, "b": 100, "c": 100, "d": 100})
    for l, (_, p, q, boost) in got.items():
        assert p == q == 250_000 and boost == 1_000_000, l


def test_corpus_shares_sum_to_one(spark):
    from paper2llm_spark.operators.webtemp import temperature_mix

    rows = temperature_mix(spark, SF).collect()
    assert len(rows) == 5
    assert abs(sum(r["q_micro"] for r in rows) - 1_000_000) <= len(rows)
    assert abs(sum(r["p_micro"] for r in rows) - 1_000_000) <= len(rows)
