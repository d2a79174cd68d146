"""Bucketed co-located join — result fidelity; the zero-exchange plan
claim lives in test_plan_quality."""

from __future__ import annotations

from pyspark.sql import functions as F

from paper2llm_spark.functions.text import tokens
from paper2llm_spark.operators.websinkbucket import bucketed_join

SF = "/root/testdata/sf0.001"


def test_bucketed_join_matches_direct_computation(spark):
    got = {r.doc_id: (r.lang, r.source, r.n_chars, r.n_toks)
           for r in bucketed_join(spark, SF).collect()}
    want = {
        r.doc_id: (r.lang, r.source, r.n, r.t)
        for r in spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "lang", "source",
            F.length("text").alias("n"),
            F.size(tokens(F.col("text"))).alias("t"),
        ).collect()
    }
    assert got == want and len(got) == 500


def test_bucketed_rewrite_is_idempotent(spark):
    a = sorted(map(tuple, bucketed_join(spark, SF).collect()))
    b = sorted(map(tuple, bucketed_join(spark, SF).collect()))
    assert a == b
