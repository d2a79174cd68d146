"""jusText-shape block classification — semantics beyond the driver's
hash gate: every class, both promotion polarities, wholesale drops."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

GOOD_PARA = (
    "<p>"
    + " ".join(f"with the item{i} of them" for i in range(14))
    + "</p>"
)


def _classify(spark, body: str):
    from paper2llm_spark.operators.webboiler import boiler_blocks_frame

    page = f"<html><head><title>T</title></head><body>{body}</body></html>"
    df = spark.createDataFrame(
        [("u", page.encode())], "url string, html binary"
    )
    return boiler_blocks_frame(df).orderBy("block_idx").collect()


def test_core_classes(spark):
    rows = _classify(
        spark,
        '<div><a href="/">Home</a> <a href="/b">About</a> '
        "<a href='/c'>Contact us</a></div>"
        f"{GOOD_PARA}"
        "<div>copyright 2024 example corporation limited worldwide "
        "print edition archive</div>",
    )
    assert [r["cls"] for r in rows] == ["bad", "good", "bad"]
    assert [r["cls_final"] for r in rows] == ["bad", "good", "bad"]
    nav = rows[0]
    assert nav.link_chars * 5 > nav.chars  # link density drove the call
    assert rows[1].chars > 200 and rows[1].stop_words * 25 >= rows[1].n_words * 8


def test_short_promotion_requires_good_on_both_sides(spark):
    promoted = _classify(
        spark, f"{GOOD_PARA}<p>and so it goes on</p>{GOOD_PARA}"
    )
    assert [r["cls"] for r in promoted] == ["good", "short", "good"]
    assert promoted[1]["cls_final"] == "good"

    stranded = _classify(
        spark,
        '<div><a href="/">Home Home Home</a></div>'
        f"<p>and so it goes on</p>{GOOD_PARA}",
    )
    assert [r["cls"] for r in stranded] == ["bad", "short", "good"]
    assert stranded[1]["cls_final"] == "bad"  # one bad side kills short


def test_neargood_promotion_needs_one_good_side(spark):
    near = "<p>the notes of the day for item 7 and more of it in the list over here today</p>"
    promoted = _classify(spark, f"{GOOD_PARA}{near}")
    assert [r["cls"] for r in promoted] == ["good", "neargood"]
    assert promoted[1]["cls_final"] == "good"  # prev sure is good

    stranded = _classify(
        spark,
        f'<div><a href="/">Home Home Home</a></div>{near}'
        "<div>copyright 2024 example corporation limited worldwide "
        "print edition archive</div>",
    )
    assert [r["cls"] for r in stranded] == ["bad", "neargood", "bad"]
    assert stranded[1]["cls_final"] == "bad"


def test_head_and_script_dropped_wholesale(spark):
    rows = _classify(
        spark,
        "<script>if (x < 2) { var t = '<p>fake</p>'; }</script>"
        f"{GOOD_PARA}",
    )
    assert len(rows) == 1  # title + script text never become blocks
    assert rows[0]["cls"] == "good"
    assert "fake" not in rows[0]["btext"] and "var" not in rows[0]["btext"]


def test_corpus_layout_all_polarities(spark):
    """The registered query's planted layout: every class occurs, both
    promotion polarities fire, and per-page structure holds."""
    from paper2llm_spark.operators.webboiler import boilerplate_blocks

    df = boilerplate_blocks(spark, SF).cache()
    try:
        by_cls = {
            r["cls"]: r["cnt"]
            for r in df.groupBy("cls").agg(F.count("*").alias("cnt")).collect()
        }
        assert set(by_cls) == {"good", "bad", "short", "neargood"}

        # short mid-block (between the two good paras) promotes to good;
        # the stranded neargood tail (sidebar..footer) stays bad
        promoted_short = df.filter(
            (F.col("cls") == "short") & (F.col("cls_final") == "good")
        ).count()
        demoted_near = df.filter(
            (F.col("cls") == "neargood") & (F.col("cls_final") == "bad")
        ).count()
        promoted_near = df.filter(
            (F.col("cls") == "neargood") & (F.col("cls_final") == "good")
        ).count()
        assert promoted_short > 0
        assert demoted_near > 0 and promoted_near > 0

        # every page keeps exactly its two >200-char paragraphs as
        # initially-good blocks
        per_url = df.filter(F.col("cls") == "good").groupBy("url").count()
        assert per_url.filter(F.col("count") != 2).count() == 0
    finally:
        df.unpersist()
