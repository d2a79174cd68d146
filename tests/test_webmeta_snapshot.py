"""HTML metadata extraction + snapshot delta — semantics beyond the
driver's hash gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_meta_extract_attribute_order_robust(spark):
    """Both <meta name=... content=...> orders must extract, either
    quote style, attributes before the anchor."""
    from paper2llm_spark.operators.webmeta import meta_extract_frame

    rows = [
        ("u1", b'<html><head><meta name="description" content="A B"></head></html>'),
        ("u2", b"<html><head><meta content='C D' name='description'></head></html>"),
        ("u3", b'<html><head><META class="x" NAME="description" CONTENT="E F"></head></html>'),
        ("u4", b"<html><head></head></html>"),
        ("u5", b'<html><head><meta name="robots" content="NOINDEX"></head></html>'),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = {r["url"]: r for r in meta_extract_frame(df).collect()}
    assert out["u1"]["description"] == "A B"
    assert out["u2"]["description"] == "C D"
    assert out["u3"]["description"] == "E F"
    assert out["u4"]["description"] == ""
    assert out["u4"]["indexable"] is True   # no robots tag -> indexable
    assert out["u5"]["indexable"] is False  # case-insensitive noindex


def test_meta_extract_all_fields_both_polarities(spark):
    from paper2llm_spark.operators.webmeta import meta_extract

    df = meta_extract(spark, SF).cache()
    for col in ("og_title", "description", "canonical", "robots"):
        n_empty = df.filter(F.col(col) == "").count()
        n_full = df.filter(F.col(col) != "").count()
        assert n_empty > 0 and n_full > 0, col


def test_snapshot_delta_statuses_consistent(spark):
    from paper2llm_spark.operators.websnapshot import snapshot_delta

    df = snapshot_delta(spark, SF).cache()
    by = {r["status"]: r["count"] for r in df.groupBy("status").count().collect()}
    assert set(by) == {"added", "removed", "changed", "unchanged"}
    # digests are consistent with the label
    assert df.filter("status = 'added' AND md5_a <> ''").count() == 0
    assert df.filter("status = 'removed' AND md5_b <> ''").count() == 0
    assert df.filter("status = 'changed' AND md5_a = md5_b").count() == 0
    assert df.filter("status = 'unchanged' AND md5_a <> md5_b").count() == 0
