"""URL-template spider-trap miner — semantics beyond the driver's
hash gate: masking rules, the trap flag's three conditions."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _templates(spark, rows):
    """Run the masking+grouping half on handcrafted (host, path) rows
    by monkey-free composition: feed through the same frame logic used
    after synthesis."""
    from paper2llm_spark.operators import webtrap

    df = spark.createDataFrame(rows, "host string, path string")
    t = df.select(
        "host",
        F.regexp_replace(
            F.regexp_replace(F.col("path"), webtrap._HEX_RUN, "H"),
            webtrap._DIGIT_RUN, "D",
        ).alias("url_template"),
    )
    return {r["host"] + "|" + r["path"]: t.collect()[i]["url_template"]
            for i, r in enumerate(df.collect())}


def test_masking_rules(spark):
    got = _templates(spark, [
        ("h", "/archive/2024/03/12345.html"),
        ("h", "/item-7?session=deadbeef1234"),
        ("h", "/about/team.html"),
        ("h", "/cafe00/x"),          # 6 hex chars < 8: digits masked only
    ])
    assert got["h|/archive/2024/03/12345.html"] == "/archive/D/D/D.html"
    assert got["h|/item-7?session=deadbeef1234"] == "/item-D?session=H"
    assert got["h|/about/team.html"] == "/about/team.html"
    assert got["h|/cafe00/x"] == "/cafeD/x"


def test_trap_requires_all_three_conditions(spark):
    from paper2llm_spark.operators.webtrap import url_templates

    out = url_templates(spark, SF).cache()
    try:
        rows = out.collect()
        assert any(r["trap"] for r in rows)
        assert any(not r["trap"] for r in rows)
        for r in rows:
            want = (
                ("D" in r["url_template"] or "H" in r["url_template"])
                and r["n_urls"] >= 4
                and 100 * r["n_urls"] >= 15 * r["host_total"]
            )
            assert r["trap"] == want, r
        # static template never flagged even when dominant
        for r in rows:
            if r["url_template"] == "/about/team.html":
                assert not r["trap"]
        # host totals consistent
        agg = out.groupBy("host").agg(
            F.sum("n_urls").alias("s"), F.max("host_total").alias("t"),
            F.min("host_total").alias("t2"),
        ).collect()
        for a in agg:
            assert a["s"] == a["t"] == a["t2"]
    finally:
        out.unpersist()
