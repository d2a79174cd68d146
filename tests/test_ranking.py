"""functions/ranking.py — the shared distributed exact ranking must
reproduce the global-window ``row_number``/``ntile`` bit-for-bit
(it replaces them in webcalib/webrfm/webrankcorr; a drift here would
silently flip driver hashes in three operators at once)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from paper2llm_spark.functions.ranking import dist_rank, ntile_expr


def _frame(spark, n: int, n_values: int):
    """n rows with heavy value ties (doc_id breaks them)."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 7919) % n_values).cast("bigint").alias("v"),
    )


@pytest.mark.parametrize("n,n_values", [(1, 1), (9, 3), (100, 7), (257, 50)])
def test_dist_rank_equals_global_row_number(spark, n, n_values):
    df = _frame(spark, n, n_values)
    got = {
        r["doc_id"]: r["rk"] for r in dist_rank(df, "rk").collect()
    }
    w = Window.orderBy("v", "doc_id")
    want = {
        r["doc_id"]: r["rk"]
        for r in df.select(
            "doc_id", F.row_number().over(w).cast("bigint").alias("rk")
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n,k", [(1, 5), (4, 5), (5, 5), (23, 5), (100, 10),
                                 (101, 10), (109, 10)])
def test_ntile_expr_equals_sql_ntile(spark, n, k):
    df = _frame(spark, n, max(1, n // 3))
    w = Window.orderBy("v", "doc_id")
    want = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id", F.ntile(k).over(w).cast("bigint").alias("b")
        ).collect()
    }
    ranked = dist_rank(df, "rk").crossJoin(
        F.broadcast(df.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("n_all")))
    )
    got = {
        r["doc_id"]: r["b"]
        for r in ranked.select(
            "doc_id", ntile_expr("rk", "n_all", k).alias("b")
        ).collect()
    }
    assert got == want


def test_dist_rank_desc_via_negation(spark):
    """DESC orderings rank the negated value — the webrfm/webrankcorr
    calling convention."""
    df = _frame(spark, 50, 6)
    got = {
        r["doc_id"]: r["rk"]
        for r in dist_rank(
            df.select("doc_id", (-F.col("v")).alias("v")), "rk"
        ).collect()
    }
    w = Window.orderBy(F.col("v").desc(), "doc_id")
    want = {
        r["doc_id"]: r["rk"]
        for r in df.select(
            "doc_id", F.row_number().over(w).cast("bigint").alias("rk")
        ).collect()
    }
    assert got == want
