"""Host-level quality prior — semantics beyond the driver's hash gate:
exact-arithmetic replay, shrinkage behavior of the empirical-Bayes
host mean, and the combine rule."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _tdiv(a: int, b: int) -> int:
    """Spark ``div`` / DuckDB ``//`` twin: integer division truncating
    toward zero (Python ``//`` floors, which differs for negatives)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _doc_score(text: str) -> int:
    from paper2llm_spark.operators.webquality import QCLF_BUCKETS, QCLF_WEIGHTS

    toks = [t for t in text.lower().split() if t]
    if not toks:
        return 0
    s = sum(
        QCLF_WEIGHTS[
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % QCLF_BUCKETS
        ]
        for t in toks
    )
    return _tdiv(s, len(toks))


def _py_host_prior(docs: list[tuple[int, str, str]]):
    """Pure-Python replay of the operator's exact integer arithmetic.

    docs: (doc_id, source, text) rows; returns {doc_id: row-tuple}."""
    from paper2llm_spark.operators.webhost import COMBINE, PRIOR_M

    scored = [(d, s + ".test", _doc_score(t)) for d, s, t in docs]
    hosts: dict[str, list[int]] = {}
    for _, h, sc in scored:
        hosts.setdefault(h, []).append(sc)
    g_mean = _tdiv(sum(sc for _, _, sc in scored), len(scored))
    a, b, dv = COMBINE
    out = {}
    for d, h, sc in scored:
        hs = hosts[h]
        prior = _tdiv(sum(hs) + PRIOR_M * g_mean, len(hs) + PRIOR_M)
        comb = _tdiv(a * sc + b * prior, dv)
        out[d] = (h, sc, len(hs), prior, comb, comb >= 0)
    return out


def test_matches_python_replay(spark):
    from paper2llm_spark.operators.webhost import host_prior_frame

    docs = [
        (0, "alpha", "good solid prose with many fine words here"),
        (1, "alpha", "more reasonable text from the same host"),
        (2, "alpha", "yet another page on the alpha host today"),
        (3, "beta", "single lonely page"),
        (4, "gamma", ""),  # zero-token doc: score must be 0, not a crash
        (5, "gamma", "zzz qqq xxx jjj vvv www"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: (
            r["host"], r["doc_score_micro"], r["host_docs"],
            r["host_prior_micro"], r["combined_micro"], r["keep"],
        )
        for r in host_prior_frame(df).collect()
    }
    assert got == _py_host_prior(docs)


def test_shrinkage_pulls_small_hosts_to_global_mean(spark):
    """A 1-doc host's prior sits ~PRIOR_M/(PRIOR_M+1) of the way toward
    the global mean; a host with >> PRIOR_M docs keeps (close to) its
    own mean.  Build the corpus so host means straddle the global."""
    from paper2llm_spark.operators.webhost import PRIOR_M, host_prior_frame

    rows = [(i, "big", f"page {i} of the dominant host corpus")
            for i in range(10 * PRIOR_M)]
    rows.append((10 * PRIOR_M, "tiny", "one weird outlier document"))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["host"]: r for r in host_prior_frame(df).collect()}

    big, tiny = out["big.test"], out["tiny.test"]
    g_mean = _tdiv(
        sum(_doc_score(t) for _, _, t in rows), len(rows)
    )
    # tiny host: |prior - g_mean| <= |own - g_mean| / (1 + PRIOR_M) + 1
    own = tiny["doc_score_micro"]
    assert abs(tiny["host_prior_micro"] - g_mean) <= (
        abs(own - g_mean) // (1 + PRIOR_M) + 1
    )
    # big host (10*M docs): prior within ~10% of the gap from its own mean
    big_scores = [_doc_score(t) for _, s, t in rows if s == "big"]
    big_mean = _tdiv(sum(big_scores), len(big_scores))
    assert abs(big["host_prior_micro"] - big_mean) <= (
        abs(big_mean - g_mean) // 10 + 1
    )


def test_keep_blends_doc_and_host_signal(spark):
    """A mediocre page on a reputable host can be kept while the same
    page on a disreputable host is dropped — the whole point of the
    prior.  Verified directly from the operator's own combine outputs."""
    from paper2llm_spark.operators.webhost import host_prior_frame

    out = host_prior_frame(
        spark.read.parquet(f"{SF}/documents.parquet")
    ).cache()
    try:
        assert out.filter(~F.col("keep")).count() > 0
        assert out.filter(F.col("keep")).count() > 0
        # combine rule holds row-wise
        bad = out.filter(
            F.col("keep") != (
                F.expr("(7*doc_score_micro + 3*host_prior_micro) div 10") >= 0
            )
        ).count()
        assert bad == 0
    finally:
        out.unpersist()
