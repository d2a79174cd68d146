"""Semantic tests for the data-selection operators (DSIR importance
weights, URL canonicalization dedup).

Cross-engine value equality vs DuckDB is covered by the parametrized
oracle gate in test_driver_contract.py; these pin the SEMANTICS on
crafted inputs where the right answer is known by hand.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from paper2llm_spark.operators.webselect import (
    canonicalize_url,
    dsir_weights_frame,
)

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _doc(i, text, lang="en", source="s0"):
    return (i, text, lang, source, len(text))


def test_dsir_upweights_target_like_documents(spark):
    # target (en) docs share a bigram vocabulary; the fr docs use a
    # disjoint one — an unseen doc written in the target vocabulary must
    # outscore one written in the source-only vocabulary
    en = "the quick brown fox jumps over the lazy dog"
    fr = "le renard brun rapide saute par dessus le chien"
    rows = (
        [_doc(i, en, "en") for i in range(8)]
        + [_doc(10 + i, fr, "fr") for i in range(8)]
        + [_doc(100, en, "fr"), _doc(101, fr, "en")]
    )
    out = {
        r["doc_id"]: r
        for r in dsir_weights_frame(
            spark.createDataFrame(rows, DOC_SCHEMA)
        ).collect()
    }
    # doc 100 is target-vocabulary text (despite its lang tag) -> high
    # weight; doc 101 is source-only vocabulary -> low weight
    assert out[100]["dsir_logratio"] > 0 > out[101]["dsir_logratio"]
    assert out[0]["dsir_logratio"] > out[10]["dsir_logratio"]
    assert out[0]["n_grams"] == 8  # 9 tokens -> 8 bigrams


def test_dsir_empty_doc_scores_zero(spark):
    rows = [_doc(1, "only-one-token"), _doc(2, "two words here")]
    out = {
        r["doc_id"]: r
        for r in dsir_weights_frame(
            spark.createDataFrame(rows, DOC_SCHEMA)
        ).collect()
    }
    assert out[1]["n_grams"] == 0 and out[1]["dsir_logratio"] == 0.0
    assert out[2]["n_grams"] == 2


def test_url_canonicalization_cases(spark):
    cases = [
        # fragment dropped, host lowercased, www + default port stripped
        ("HTTPS://WWW.News.Example.COM:443/A/b#frag", "https://news.example.com/A/b"),
        # tracking params removed, real params kept, separators tidied
        (
            "https://ex.com/p?utm_source=feed&utm_campaign=x&ref=home",
            "https://ex.com/p?ref=home",
        ),
        ("https://ex.com/p/?fbclid=AbC123", "https://ex.com/p"),
        ("http://ex.com:80/p?gclid=1", "http://ex.com/p"),
        # trailing slash off a non-empty path; path CASE preserved
        ("https://ex.com/Path/", "https://ex.com/Path"),
        # bare host: nothing to strip
        ("https://ex.com", "https://ex.com"),
        # non-default port kept
        ("https://ex.com:8443/p", "https://ex.com:8443/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    for (raw, want), g in zip(cases, got):
        assert g == want, f"{raw} -> {g}, want {want}"


def test_sequence_pack_concat_then_chunk_invariants(spark):
    from paper2llm_spark.operators.webselect import (
        CTX_TOKENS,
        sequence_pack_frame,
    )

    # 6 docs of 50 tokens each -> within any one shard, doc k starts at
    # 50*k: seq_idx floor(50k/CTX), offset 50k % CTX
    rows = [_doc(i, " ".join(f"w{j}" for j in range(50))) for i in range(6)]
    out = sequence_pack_frame(spark.createDataFrame(rows, DOC_SCHEMA)).collect()
    by_shard: dict = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        cum = by_shard.get(r["shard"], 0)
        assert r["n_tokens"] == 50
        assert r["seq_idx"] == cum // CTX_TOKENS
        assert r["seq_offset"] == cum % CTX_TOKENS
        by_shard[r["shard"]] = cum + r["n_tokens"]


def test_mixture_plan_rates(spark):
    from paper2llm_spark.operators.webselect import (
        MIXTURE_BUDGET_TOKENS,
        MIXTURE_TARGET,
        mixture_plan_frame,
    )

    # en: plenty available -> rate < 1 matches budget; zh: scarce -> capped at 1
    rows = [_doc(i, " ".join(f"w{j}" for j in range(100)), "en") for i in range(200)]
    rows += [_doc(1000 + i, " ".join(f"w{j}" for j in range(10)), "zh") for i in range(5)]
    out = {
        r["lang"]: r
        for r in mixture_plan_frame(
            spark.createDataFrame(rows, DOC_SCHEMA)
        ).collect()
    }
    want_en = int(MIXTURE_TARGET["en"] * MIXTURE_BUDGET_TOKENS) / 20000.0
    assert abs(out["en"]["sample_rate"] - round(want_en, 4)) < 1e-9
    assert out["zh"]["sample_rate"] == 1.0
    assert out["en"]["avail_tokens"] == 20000


def test_weighted_sample_matches_python_replay(spark):
    """Efraimidis–Spirakis keys replayed exactly: ln(u) in micro-nats
    over the portable hash, divided by the token-count weight; top-k by
    (key desc, doc_id)."""
    import hashlib
    import math

    from paper2llm_spark.operators.webselect import weighted_sample_frame

    DOC_SCHEMA = (
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    rows = [
        (i, " ".join(["w"] * (1 + (i * 7) % 50)), "en", "s0", 0)
        for i in range(40)
    ]
    out = weighted_sample_frame(
        spark.createDataFrame(rows, DOC_SCHEMA), k=10
    ).collect()

    def es_key(doc_id, n_toks):
        h = int(hashlib.md5(f"ws:{doc_id}".encode()).hexdigest()[:15], 16)
        u = h / float(1 << 60)
        return math.floor(math.log(u) * 1e6 + 0.5) / max(n_toks, 1)

    want = sorted(
        ((es_key(i, 1 + (i * 7) % 50), i) for i in range(40)),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    got = [(r["sample_rank"], r["doc_id"]) for r in out]
    assert sorted(got) == [(rk + 1, i) for rk, (_k, i) in enumerate(want)]


def test_weighted_sample_is_take_ordered_not_global_sort(spark):
    """The top-k must compile to TakeOrderedAndProject (per-partition
    heads merged at the driver) — a global Sort+Exchange before the
    limit would shuffle the corpus to sample 100 rows."""
    from paper2llm_spark.operators.webselect import weighted_sample

    plan = (
        weighted_sample(spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
