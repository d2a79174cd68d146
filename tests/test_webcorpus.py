"""Semantic tests for the webcorpus operators (duplicated-block
removal, domain stats, per-domain cap, unigram LM proxy).

Cross-engine value equality vs DuckDB is covered by the parametrized
oracle gate in test_driver_contract.py; these pin the SEMANTICS on
crafted inputs where the right answer is known by hand.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from paper2llm_spark.operators.webcorpus import (
    DOMAIN_CAP_K,
    WINDOW_W,
    domain_cap_frame,
    domain_stats,
    unigram_logprob_frame,
    window_dedup_frame,
)

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _doc(i, text, lang="en", source="s0"):
    return (i, text, lang, source, len(text))


def test_window_dedup_removes_shared_block_from_all_copies(spark):
    shared = " ".join(f"w{i}" for i in range(WINDOW_W))  # one full window
    uniq_a = " ".join(f"a{i}" for i in range(WINDOW_W))
    uniq_b = " ".join(f"b{i}" for i in range(WINDOW_W))
    rows = [
        _doc(1, f"{shared} {uniq_a}"),
        _doc(2, f"{shared} {uniq_b}"),
        _doc(3, uniq_b.upper()),  # tokens lowercase -> dup of doc 2's tail
    ]
    out = {
        r["doc_id"]: r
        for r in window_dedup_frame(
            spark.createDataFrame(rows, DOC_SCHEMA)
        ).collect()
    }
    # the shared window is removed from BOTH docs 1 and 2
    assert out[1]["n_windows"] == 2 and out[1]["n_dup_windows"] == 1
    assert out[1]["clean_text"] == uniq_a
    assert out[2]["n_dup_windows"] == 2  # shared + uniq_b (doc 3 copies it)
    assert out[2]["clean_text"] == ""
    assert out[3]["clean_text"] == ""


def test_window_dedup_tail_window_and_intra_doc_repeat(spark):
    # 15 tokens -> windows of 10 and 5 (short tail kept as a window)
    base = " ".join(f"t{i}" for i in range(15))
    rows = [_doc(1, base)]
    r = window_dedup_frame(spark.createDataFrame(rows, DOC_SCHEMA)).collect()[0]
    assert r["n_windows"] == 2 and r["n_dup_windows"] == 0
    assert r["clean_text"] == base.lower()
    # a window repeated INSIDE one doc counts as corpus-duplicated too
    w = " ".join(f"x{i}" for i in range(WINDOW_W))
    rows = [_doc(2, f"{w} {w}")]
    r = window_dedup_frame(spark.createDataFrame(rows, DOC_SCHEMA)).collect()[0]
    assert r["n_dup_windows"] == 2 and r["clean_text"] == ""


def test_domain_cap_keeps_k_per_source_with_doc_id_tiebreak(spark):
    # identical text -> identical quality; ties broken by doc_id asc
    rows = [
        _doc(i, "the quick brown fox and the lazy dog", source="hot")
        for i in range(1, DOMAIN_CAP_K + 6)
    ] + [_doc(100, "one two three", source="cold")]
    out = domain_cap_frame(spark.createDataFrame(rows, DOC_SCHEMA))
    got = out.groupBy("source").agg(
        F.count("*").alias("n"), F.max("doc_id").alias("max_id")
    ).collect()
    by_src = {r["source"]: (r["n"], r["max_id"]) for r in got}
    assert by_src["hot"] == (DOMAIN_CAP_K, DOMAIN_CAP_K)  # ids 1..K kept
    assert by_src["cold"] == (1, 100)


def test_unigram_logprob_oov_floor_and_mean(spark):
    # corpus: 'aa' x3, 'bb' x1 -> total 4. VOCAB_V=16 >= 2 so both in
    # vocab; no OOV. doc 1 = 'aa aa aa', doc 2 = 'bb'
    rows = [_doc(1, "aa aa aa"), _doc(2, "bb")]
    out = {
        r["doc_id"]: r
        for r in unigram_logprob_frame(
            spark.createDataFrame(rows, DOC_SCHEMA)
        ).collect()
    }
    lp = lambda p: math.floor(math.log(p) * 1e6 + 0.5) / 1e6
    exp1 = math.floor(lp(3 / 4) * 10000 + 0.5) / 10000
    exp2 = math.floor(lp(1 / 4) * 10000 + 0.5) / 10000
    assert out[1]["n_oov"] == 0 and out[1]["avg_logprob"] == exp1
    assert out[2]["avg_logprob"] == exp2


def test_unigram_logprob_vocab_truncation_makes_oov(spark):
    # 17 distinct tokens, one doc each +1 extra hit for first 16 so the
    # 17th ('z') falls out of the top-16 vocab -> OOV floor ln(1/total)
    toks = [f"t{i:02d}" for i in range(16)] + ["z"]
    text = " ".join(toks) + " " + " ".join(toks[:16])
    rows = [_doc(1, text)]
    r = unigram_logprob_frame(spark.createDataFrame(rows, DOC_SCHEMA)).collect()[0]
    assert r["n_tokens"] == 33 and r["n_oov"] == 1


def test_domain_stats_counts(spark):
    out = {
        r["source"]: r
        for r in domain_stats(spark, "/root/testdata/sf0.01").collect()
    }
    assert len(out) == 20
    r = out["src0"]
    assert r["n_docs"] == 25 and r["n_langs"] >= 1
    assert abs(r["avg_doc_tokens"] * r["n_docs"] - r["n_tokens"]) < 1


def test_char_entropy_hand_computed(spark):
    import math

    from paper2llm_spark.operators.webcorpus import char_entropy_frame

    rows = [_doc(1, "aabb"), _doc(2, "aaaa"), _doc(3, "")]
    out = {
        r["doc_id"]: r
        for r in char_entropy_frame(
            spark.createDataFrame(rows, DOC_SCHEMA)
        ).collect()
    }
    # two symbols, equal mass -> ln 2 nats; each -p*ln(p) term floors to
    # micro-nats BEFORE the sum, so the expectation doubles the floored
    # per-term value
    term = math.floor(-(0.5 * math.log(0.5)) * 1e6 + 0.5)
    exp = math.floor((2 * term) / 1e6 * 1e4 + 0.5) / 1e4
    assert out[1]["n_alpha"] == 4 and out[1]["char_entropy"] == exp
    assert out[2]["char_entropy"] == 0.0  # single symbol
    assert out[3]["n_alpha"] == 0 and out[3]["char_entropy"] == 0.0


def test_lsh_verified_pairs_scores_and_filters(spark, tmp_path):
    """Identical docs estimate Jaccard 1.0; a half-overlapping doc that
    shares a band but fails verification is dropped."""
    import os

    from paper2llm_spark.operators.dedup import lsh_verified_pairs

    same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [_doc(1, same), _doc(2, same), _doc(3, "totally different words here now")]
    d = str(tmp_path / "sfv")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    out = lsh_verified_pairs(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["est_jaccard"] == 1.0


def test_ccnet_buckets_terciles_and_ordering(spark):
    """Per language: bucket sizes differ by <= 1 (ntile contract) and
    every head doc scores >= every tail doc (ordering is the exact
    bigint micro-nat key, so this is deterministic)."""
    from paper2llm_spark.operators.webcorpus import ccnet_buckets

    df = ccnet_buckets(spark, "/root/testdata/sf0.001").cache()
    sizes = {
        (r["lang"], r["bucket"]): r["count"]
        for r in df.groupBy("lang", "bucket").count().collect()
    }
    langs = {k[0] for k in sizes}
    assert langs, "no languages bucketed"
    for lang in langs:
        per = [sizes.get((lang, b), 0) for b in ("head", "middle", "tail")]
        assert max(per) - min(per) <= 1, (lang, per)
    import pyspark.sql.functions as F

    agg = (
        df.groupBy("lang")
        .agg(
            F.min(F.when(F.col("bucket") == "head", F.col("avg_lp_micro")))
            .alias("head_min"),
            F.max(F.when(F.col("bucket") == "tail", F.col("avg_lp_micro")))
            .alias("tail_max"),
        )
        .collect()
    )
    for r in agg:
        assert r["head_min"] >= r["tail_max"], r


def test_ccnet_buckets_vocab_joins_broadcast(spark):
    """The vocab and the 1-row total are vocabulary-sized state: every
    join must be broadcast (a sort-merge join would reshuffle the
    exploded token stream)."""
    from paper2llm_spark.operators.webcorpus import ccnet_buckets

    plan = ccnet_buckets(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_semantic_dedup_drops_planted_copies_only(spark):
    """SemDeDup: planted near-dup copies must drop (except pairs split
    by a cell boundary — the paper's recall caveat), and no original
    may be dropped on the near-orthogonal noise corpus."""
    from paper2llm_spark.operators.similarity import (
        N_PLANT,
        PLANT_OFFSET,
        semantic_dedup,
    )
    import pyspark.sql.functions as F

    df = semantic_dedup(spark, "/root/testdata/sf0.001").cache()
    copies = df.filter(F.col("vec_id") >= PLANT_OFFSET)
    assert copies.count() == min(
        N_PLANT,
        df.filter(F.col("vec_id") < PLANT_OFFSET).count(),
    )
    dropped_copies = copies.filter(~F.col("keep"))
    assert dropped_copies.count() > 0
    # every dropped copy points at its own original
    assert dropped_copies.filter(
        F.col("dup_of") != F.col("vec_id") - PLANT_OFFSET
    ).count() == 0
    assert df.filter(
        (F.col("vec_id") < PLANT_OFFSET) & ~F.col("keep")
    ).count() == 0


def test_length_quantiles_semantics(spark):
    """p10/p50/p90/p99 replayed with numpy's linear interpolation on a
    crafted single-language corpus."""
    import numpy as np
    from paper2llm_spark.operators.webcorpus import length_quantiles_frame

    DOC_SCHEMA = (
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    lens = [1, 2, 3, 4, 5, 6, 7, 8, 9, 100]
    rows = [
        (i, " ".join(["w"] * n), "en", "s0", 2 * n) for i, n in enumerate(lens)
    ]
    r = length_quantiles_frame(
        spark.createDataFrame(rows, DOC_SCHEMA)
    ).collect()[0]
    assert (r["lang"], r["n_docs"], r["min_toks"], r["max_toks"]) == (
        "en", len(lens), 1, 100,
    )
    import math
    for p in (10, 50, 90, 99):
        want = math.floor(
            float(np.percentile(lens, p, method="linear")) * 1e4 + 0.5
        ) / 1e4
        assert r[f"p{p:02d}_toks"] == want, (p, r[f"p{p:02d}_toks"], want)
