"""JSONL shard sink — round-trip fidelity and byte-stable shards."""

from __future__ import annotations

import glob
import hashlib

from pyspark.sql import functions as F

from paper2llm_spark.operators.websinkjsonl import (
    N_JSONL_SHARDS, jsonl_roundtrip, write_jsonl,
)

SF = "/root/testdata/sf0.001"


def test_roundtrip_matches_source_facts(spark):
    back = {r.doc_id: r for r in jsonl_roundtrip(spark, SF).collect()}
    src = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "source",
        F.md5("text").alias("m"), F.length("text").alias("n"),
    ).collect()
    assert len(back) == len(src) == 500
    for r in src:
        b = back[r.doc_id]
        assert (b.lang, b.source, b.text_md5, b.text_len) == \
            (r.lang, r.source, r.m, r.n)


def test_shards_are_byte_stable_across_rewrites(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text", "source", "lang"
    )
    hashes = []
    for d in ("w1", "w2"):
        out = str(tmp_path / d)
        write_jsonl(docs, out)
        files = sorted(glob.glob(f"{out}/part-*.gz"))
        assert len(files) == N_JSONL_SHARDS
        # compare decompressed content (gzip headers may carry mtime)
        import gzip
        hashes.append(sorted(
            hashlib.md5(gzip.open(f, "rb").read()).hexdigest()
            for f in files
        ))
    assert hashes[0] == hashes[1]


def test_lines_are_single_line_json_objects(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "line1\nline2\ttab", "s", "en")],
        "doc_id long, text string, source string, lang string",
    )
    out = str(tmp_path / "nl")
    write_jsonl(docs, out)
    import gzip
    raw = b"".join(
        gzip.open(f, "rb").read()
        for f in sorted(glob.glob(f"{out}/part-*.gz"))
    ).decode()
    lines = [ln for ln in raw.split("\n") if ln]
    assert len(lines) == 1
    import json
    obj = json.loads(lines[0])
    assert obj == {"id": 1, "text": "line1\nline2\ttab",
                   "source": "s", "lang": "en"}
