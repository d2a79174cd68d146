"""Column twins vs the Python oracle on an adversarial corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from paper2llm_spark.functions import refcols
from paper2llm_spark.oracle.bibtex import extract_year_from_date, generate_bibtex_key
from paper2llm_spark.oracle.enhance import extract_image_context
from paper2llm_spark.oracle.export import calculate_image_metrics
from paper2llm_spark.oracle.splitter import count_words, extract_title
from paper2llm_spark.oracle.vision import extract_description_from_tags

DOCS = [
    "# A Title\n\nbody",
    "intro\n# Later Title \nbody",
    "no title here",
    "title={Bib Fallback} text",
    "# First\n# Second",
    "#NoSpace heading",
    "### Not H1\n\ntitle={Both Present}",
    "",
    "multi\n\n\nlines\twith\ttabs  and   spaces",
    "# Tab\ttitle with tab",
    "x nbsp separated words",
]

TAGS = [
    "<img_desc>plain</img_desc>",
    "  <img_desc> padded </img_desc>  ",
    "<img_desc>no closing tag",
    "prefix <img_desc>mid</img_desc> suffix",
    "no tags at all",
    "<img_desc></img_desc>",
    "\n\t<img_desc>ws lead</img_desc>",
    "two <img_desc>first</img_desc> <img_desc>second</img_desc>",
]

DATES = ["2024-05-01", "1999-12-31T23:59:59Z", "not a date", "", None, "2026"]

KEYS = [
    ("On the Convergence of Things", "Ada Lovelace", "2026"),
    ("A Big Study", "Grace Hopper", "2020"),
    ("An Of The", "Alan M. Turing", "1950"),
    ("X Y Z", "Single", "2001"),
    ("123 456 methodology", "Kurt Friedrich Goedel", "1931"),
]

METRICS_DOCS = [
    "![a](x.png) and ![b](y.png)",
    "> **Image Description:** colon form\n![a](x)",
    "> **Image description.** pipeline form",
    "no images",
]


def _eval(spark, values, col_fn, in_type="string"):
    df = spark.createDataFrame([(v,) for v in values], f"v {in_type}")
    rows = df.select(col_fn(F.col("v")).alias("out")).collect()
    return [r["out"] for r in rows]


def test_title_extract_matches_oracle(spark):
    got = _eval(spark, DOCS, refcols.title_extract_t1)
    expected = [extract_title(d) for d in DOCS]
    assert got == expected


def test_tag_extract_matches_oracle(spark):
    got = _eval(spark, TAGS, refcols.tag_extract_v2)
    expected = [extract_description_from_tags(t) for t in TAGS]
    assert got == expected


def test_year_matches_oracle(spark):
    got = _eval(spark, DATES, refcols.year_b1)
    expected = [extract_year_from_date(d) for d in DATES]
    assert got == expected


def test_bibtex_key_matches_oracle(spark):
    df = spark.createDataFrame(KEYS, "title string, author string, year string")
    rows = df.select(
        refcols.bibtex_key_b3(
            F.col("title"), F.col("author"), F.col("year")
        ).alias("key")
    ).collect()
    expected = [generate_bibtex_key(t, [a], y) for t, a, y in KEYS]
    assert [r["key"] for r in rows] == expected


def test_image_metrics_matches_oracle(spark):
    df = spark.createDataFrame([(d,) for d in METRICS_DOCS], "v string")
    rows = df.select(refcols.image_metrics_o3(F.col("v")).alias("m")).collect()
    for row, doc in zip(rows, METRICS_DOCS):
        exp = calculate_image_metrics(doc)
        assert row["m"]["original_image_count"] == exp["original_image_count"], doc
        assert row["m"]["described_image_count"] == exp["described_image_count"], doc
        assert row["m"]["has_processed_images"] == exp["has_processed_images"], doc


def test_image_context_matches_oracle(spark):
    cases = [
        ("short page", "img-0.jpeg"),
        ("x" * 2500, "img-3.jpeg"),
        ("y" * 2000, "fig2"),
        ("z", "-leading-dash"),
    ]
    df = spark.createDataFrame(cases, "md string, iid string")
    rows = df.select(
        refcols.image_context_e4(F.col("md"), F.col("iid")).alias("ctx")
    ).collect()
    for row, (md, iid) in zip(rows, cases):
        assert row["ctx"] == extract_image_context(md, iid), iid


def test_word_count_matches_oracle(spark):
    got = _eval(spark, DOCS, refcols.word_count_t4)
    expected = [count_words(d) for d in DOCS]
    assert got == expected
