"""Publication-date extraction (htmldate-shape precedence cascade):
source precedence, plausibility rejection, both meta attribute orders,
URL partial dates — semantics beyond the driver's hash gate."""

from __future__ import annotations


def _date(spark, url: str, page: str):
    from paper2llm_spark.operators.webdate import date_extract_frame

    df = spark.createDataFrame(
        [(url, page.encode())], "url string, html binary"
    )
    (row,) = date_extract_frame(df).collect()
    return row


META = '<meta property="article:published_time" content="{d}T10:00:00Z">'
META_REV = '<meta content="{d}T08:00:00Z" property="article:published_time">'
TIME = '<time datetime="{d}">then</time>'


def test_precedence_meta_beats_all(spark):
    row = _date(
        spark, "https://x.test/2019/07/9",
        META.format(d="2021-03-04") + TIME.format(d="2022-05-06")
        + "<p>posted 2023-07-08 ok</p>",
    )
    assert (row.pub_date, row.date_src) == ("2021-03-04", "meta")
    assert row.time_date == "2022-05-06"
    assert row.url_date == "2019-07-01"
    assert row.text_date == "2023-07-08"


def test_precedence_cascade_time_url_text_none(spark):
    row = _date(spark, "https://x.test/9", TIME.format(d="2020-01-02"))
    assert (row.pub_date, row.date_src) == ("2020-01-02", "time")
    row = _date(spark, "https://x.test/2018/11/9", "<p>plain</p>")
    assert (row.pub_date, row.date_src) == ("2018-11-01", "url")
    row = _date(spark, "https://x.test/9", "<p>seen 2017-09-30 ok</p>")
    assert (row.pub_date, row.date_src) == ("2017-09-30", "text")
    row = _date(spark, "https://x.test/9", "<p>undated</p>")
    assert row.pub_date is None and row.date_src == "none"


def test_implausible_year_falls_through(spark):
    """htmldate's min/max filter: a 1970 meta date is rejected and the
    cascade falls to the time element; out-of-range text too."""
    row = _date(
        spark, "https://x.test/9",
        META.format(d="1970-01-02") + TIME.format(d="2019-04-05"),
    )
    assert row.meta_date is None
    assert (row.pub_date, row.date_src) == ("2019-04-05", "time")
    row = _date(spark, "https://x.test/9", "<p>in 2052-01-01 maybe</p>")
    assert row.pub_date is None and row.date_src == "none"


def test_meta_attribute_order_reversed(spark):
    row = _date(spark, "https://x.test/9", META_REV.format(d="2016-02-03"))
    assert (row.pub_date, row.date_src) == ("2016-02-03", "meta")


def test_url_month_must_be_valid(spark):
    """/2020/13/ is not a date segment; /2020/12/ is."""
    row = _date(spark, "https://x.test/2020/13/9", "<p>x</p>")
    assert row.url_date is None
    row = _date(spark, "https://x.test/2020/12/9", "<p>x</p>")
    assert row.url_date == "2020-12-01"


def test_corpus_all_sources_fire(spark):
    from paper2llm_spark.operators.webdate import date_extract

    rows = date_extract(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    srcs = {r.date_src for r in rows}
    assert srcs == {"meta", "time", "url", "text", "none"}
    for r in rows:
        if r.pub_date is not None:
            y = int(r.pub_date[:4])
            assert 1995 <= y <= 2030
