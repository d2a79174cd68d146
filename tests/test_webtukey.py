"""Tukey-fence (lg2 space) + Hampel (raw) outlier gate — hand-computed
order statistics (type-1, no interpolation)."""

from __future__ import annotations

from paper2llm_spark.operators.webtukey import fence_frame, outlier_fences


def _run(spark, vals):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id long, v long"
    )
    return {r.doc_id: r for r in fence_frame(df).collect()}


def test_fences_hand_computed(spark):
    # v = 1..12 plus outlier 100.  lg2 multiset sorted:
    # [0,1,1,2,2,2,2,3,3,3,3,3,6]; N=13 -> Q1@4 = 2, Q3@10 = 3,
    # IQR=1, fence (3*1) div 2 = 1 -> lo=1, hi=4.
    # Hampel raw: med@7 = 7; |v-7| sorted [0,1,1,2,2,3,3,4,4,5,5,6,93]
    # -> MAD@7 = 3; 10000*|v-7| > 44478*3 only for v=100 (93).
    got = _run(spark, list(range(1, 13)) + [100])
    assert got[0].tukey_flag == "low"        # v=1, lg2 0 < 1
    assert got[12].tukey_flag == "high"      # v=100, lg2 6 > 4
    assert all(got[i].tukey_flag == "in" for i in range(1, 12))
    assert got[12].hampel_out is True
    assert sum(r.hampel_out for r in got.values()) == 1
    assert got[12].lg2 == 6 and got[0].lg2 == 0


def test_mad_zero_degenerates_to_any_off_median(spark):
    # [5,5,5,9]: med=5, MAD=0 -> every v != med is a Hampel outlier.
    # lg2 multiset [2,2,2,3]: Q1@1=2, Q3@3=2, IQR=0 -> lo=hi=2,
    # so v=9 (lg2 3) is ALSO a Tukey high.
    got = _run(spark, [5, 5, 5, 9])
    assert [got[i].hampel_out for i in range(4)] == [False] * 3 + [True]
    assert got[3].tukey_flag == "high"
    assert all(got[i].tukey_flag == "in" for i in range(3))


def test_registered_query_plants_all_polarities(spark):
    rows = outlier_fences(spark, "/root/testdata/sf0.001").collect()
    flags = {r.tukey_flag for r in rows}
    assert flags == {"low", "in", "high"}
    assert {r.hampel_out for r in rows} == {True, False}
    # planted giants flag high, planted dwarfs flag low
    assert all(r.tukey_flag == "high"
               for r in rows if r.doc_id >= 10_000_000 and r.doc_id < 20_000_000)
    assert all(r.tukey_flag == "low" for r in rows if r.doc_id >= 20_000_000)
