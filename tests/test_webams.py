"""AMS tug-of-war F2 sketch — exactness on a single-term stream and
the grouped-median error band on the fixture corpus."""

from __future__ import annotations

from paper2llm_spark.operators.webams import ams_f2, ams_frame


def test_single_term_stream_is_exact(spark):
    # one term with f=4: every X_r = +-4, every estimator 16 == F2;
    # the sketch is exact whenever one term carries all the mass
    df = spark.createDataFrame([(0, "a a a a")], "doc_id long, text string")
    got = ams_frame(df.select("text")).collect()[0]
    assert (got.n_tokens, got.n_terms, got.f2_exact) == (4, 1, 16)
    assert got.f2_est == 16 and got.err_ppm == 0


def test_grouped_median_error_band_on_fixture(spark):
    got = ams_f2(spark, "/root/testdata/sf0.001").collect()[0]
    assert got.f2_exact > 0
    # sqrt(2/4) relative noise per group; the 31-term heavy-tailed
    # fixture vocabulary is the worst case the docstring documents —
    # lock a 4x band, and the self-audit column's consistency
    assert got.f2_exact // 4 <= got.f2_est <= 4 * got.f2_exact
    assert got.err_ppm == abs(got.f2_est - got.f2_exact) * 1_000_000 \
        // got.f2_exact
