"""Corpus-statistics battery — hand-computed Good-Turing, PMI,
Heaps, burstiness, G² keyness, and Spearman on tiny inputs."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from paper2llm_spark.operators.webburst import MIN_DF, burstiness_frame
from paper2llm_spark.operators.webgoodturing import good_turing_frame
from paper2llm_spark.operators.webheaps import heaps_frame
from paper2llm_spark.operators.webkeyness import keyness_frame
from paper2llm_spark.operators.webpmi import pmi_frame
from paper2llm_spark.operators.webspearman import spearman_frame


def _docs(spark, texts, sources=None):
    rows = [
        (i, t, (sources[i] if sources else "src0"), len(t))
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )


def test_good_turing_table(spark):
    # counts: a=3, b=2, c=2, d=1, e=1, f=1  ->  n_1=3, n_2=2, n_3=1
    df = _docs(spark, ["a a a b b", "c c d e f"])
    got = {r.r: (r.n_r, r.r_star_micro) for r in good_turing_frame(df).collect()}
    # r=1: r* = 2 * n_2/n_1 = 2*2/3 -> 1333333 micro
    assert got[1] == (3, 1_333_333)
    # r=2: r* = 3 * n_3/n_2 = 3/2 -> 1500000
    assert got[2] == (2, 1_500_000)
    # r=3: n_4 = 0 -> raw estimate 0
    assert got[3] == (1, 0)


def test_pmi_collocation_score(spark):
    # 5 identical docs of "x y": bigram (x,y) c12=5, marginals 5/5, N=5
    # pmi = ln(5*5/(5*5)) = 0
    df = _docs(spark, ["x y"] * 5)
    got = {(r.w1, r.w2): (r.c12, r.pmi_micro) for r in pmi_frame(df).collect()}
    assert got == {("x", "y"): (5, 0)}


def test_pmi_positive_association(spark):
    # "p q" x5 plus "p r" x5: (p,q) c12=5, c1(p)=10, c2(q)=5, N=10
    # pmi(p,q) = ln(5*10/(10*5)) = 0; add "s q" x5 -> N=15, c2(q)=10
    # pmi(p,q) = ln(5*15/(15*10)) = ln(0.5) < 0
    df = _docs(spark, ["p q"] * 5 + ["p r"] * 5 + ["s q"] * 5)
    got = {(r.w1, r.w2): r.pmi_micro for r in pmi_frame(df).collect()}
    assert got[("p", "r")] == math.floor(math.log(5 * 15 / (10 * 5)) * 1e6 + 0.5)
    assert got[("p", "q")] < 0 < got[("p", "r")]


def test_heaps_vocabulary_first_occurrence(spark):
    # 10 docs; doc i introduces word "w{i}" plus constant "k".
    # checkpoint j covers doc_id < j -> vocab = j (new words) + 1 (k)
    df = _docs(spark, [f"k w{i}" for i in range(10)])
    got = {r.j: (r.docs_cum, r.tokens_cum, r.vocab_cum)
           for r in heaps_frame(df.sparkSession, df).collect()}
    for j in range(1, 11):
        assert got[j] == (j, 2 * j, j + 1)


def test_burstiness_separates_content_from_function_words(spark):
    # "the" once per doc (burst 1.0); "zebra" 4x in one doc of the 3
    # it appears in (burst 2.0)
    texts = ["the zebra zebra zebra zebra", "the zebra", "the zebra",
             "the filler words here"]
    got = {r.w: (r.tf, r.df, r.burst_micro)
           for r in burstiness_frame(_docs(spark, texts)).collect()}
    assert got["the"] == (4, 4, 1_000_000)
    assert got["zebra"] == (6, 3, 2_000_000)
    assert MIN_DF == 3  # the frozen floor the fixture relies on


def test_keyness_g2_hand_value(spark):
    # A (src0): "x" x8 + "y" x2;  B (src1): "x" x2 + "y" x8
    # word x: a=8, b=2, NA=10, NB=10, E_a=E_b=5
    # G2 = 2*(8*ln(8/5) + 2*ln(2/5))
    texts = ["x x x x x x x x y y", "x x y y y y y y y y"]
    df = _docs(spark, texts, sources=["src0", "src1"])
    got = {r.w: (r.cnt_a, r.cnt_b, r.g2_micro, r.overused)
           for r in keyness_frame(df).collect()}
    g2 = 2 * (8 * math.log(8 / 5) + 2 * math.log(2 / 5))
    assert got["x"] == (8, 2, math.floor(g2 * 1e6 + 0.5), True)
    # y is the mirror image: same G2, underused
    assert got["y"] == (2, 8, math.floor(g2 * 1e6 + 0.5), False)


def test_spearman_perfect_and_inverted(spark):
    # y (token count) always 2; x = n_chars strictly increasing with
    # doc_id -> both rank by doc_id within ties -> rho = 1
    texts = ["a b", "aa bb", "aaa bbb", "aaaa bbbb"]
    one = spearman_frame(_docs(spark, texts)).collect()[0]
    assert (one.n, one.rho_micro) == (4, 1_000_000)
    # inverted x: ranks reverse except tie-broken y follows doc_id ->
    # sum_d2 is the full reversal 20 -> rho = 1e6 - 6e6*20//60 = -1e6
    inv = _docs(spark, texts).withColumn(
        "n_chars", F.lit(100) - F.col("n_chars")
    )
    two = spearman_frame(inv).collect()[0]
    assert (two.sum_d2, two.rho_micro) == (20, -1_000_000)
