"""Multimodal plumbing tests — stub seams + Spark-side batch shape.

The decode/resize/feature-extract steps are stubbed (no image libs in
this container, SURVEY-mandated seam), but the Spark plumbing — schemas,
Arrow batch shapes, explode/repartition plans — is real and exercised
here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from paper2llm_spark.operators.multimodal import (
    decode_image,
    extract_binary_meta,
    feature_vector,
    frame_sample_plan,
    resize_image,
)


def test_decode_image_fake_is_deterministic():
    a = decode_image(b"payload-bytes")
    b = decode_image(b"payload-bytes")
    assert a == b
    assert a["n_bytes"] == 13
    assert 1 <= a["width"] <= 1024 and 1 <= a["height"] <= 1024


def test_decode_image_real_path_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"x", use_fake=False)


def test_resize_feature_stubs():
    out = resize_image(b"abcdef", 64, 64)
    assert isinstance(out, bytes) and len(out) == 64 * 64 // 64
    vec = feature_vector(b"abcdef", dim=16)
    assert len(vec) == 16 and all(0.0 <= x < 1.0 for x in vec)
    assert vec == feature_vector(b"abcdef", dim=16)
    with pytest.raises(NotImplementedError):
        resize_image(b"x", 2, 2, use_fake=False)
    with pytest.raises(NotImplementedError):
        feature_vector(b"x", use_fake=False)


def test_extract_binary_meta_schema_and_values(spark):
    df = spark.createDataFrame(
        [(1, b"hello"), (2, b"")], "doc_id long, payload binary"
    )
    rows = {r["doc_id"]: r for r in extract_binary_meta(df).collect()}
    assert rows[1]["n_bytes"] == 5
    assert rows[1]["digest"] == __import__("hashlib").md5(b"hello").hexdigest()
    assert rows[2]["n_bytes"] == 0


def test_frame_sample_counts(spark):
    df = spark.createDataFrame(
        [(1, b"x" * 25), (2, b"y" * 3)], "doc_id long, payload binary"
    )
    counts = (
        frame_sample_plan(df, every_n=10)
        .groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    )
    got = {r["doc_id"]: r["n"] for r in counts}
    # 25 bytes / 10 -> 2 frames; tiny payloads still sample one frame
    assert got == {1: 2, 2: 1}
