"""BM25 top-k — semantics beyond the driver's hash gate: scoring
against a pure-Python replay, ranking behavior, tournament exactness."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _py_bm25(docs: dict[int, str], queries: dict[int, list[str]]):
    """Pure-Python replay of the operator's exact integer arithmetic."""
    toks = {d: t.lower().split() for d, t in docs.items()}
    dl = {d: len(t) for d, t in toks.items()}
    n = len(docs)
    t_total = sum(dl.values())
    out = {}
    for q, terms in queries.items():
        scores = {}
        for term in terms:
            df = sum(1 for t in toks.values() if term in t)
            if df == 0:
                continue
            idf = math.floor(
                math.log((2 * n - 2 * df + 1) / (2 * df + 1)) * 1e6 + 0.5
            )
            for d, t in toks.items():
                tf = t.count(term)
                if tf == 0:
                    continue
                s = math.floor(
                    (idf * tf * 44 * t_total)
                    / (20 * t_total * tf + 6 * t_total + 18 * dl[d] * n)
                )
                scores[d] = scores.get(d, 0) + s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        out[q] = ranked
    return out


def test_scores_match_python_replay(spark):
    from paper2llm_spark.operators.websearch import QUERY_EVERY, bm25_topk_frame

    docs = {
        0: "apple banana apple cherry the the the",      # seeds query 0
        1: "apple apple apple apple",
        2: "banana cherry date elder the",
        3: "the the the the the the the the the the",
        4: "apple banana",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score_micro"])
        for r in bm25_topk_frame(df).collect()
    }
    assert QUERY_EVERY > 4  # only doc 0 seeds a query
    want = _py_bm25(docs, {0: ["apple", "banana", "cherry"]})[0]
    for rank, (doc, score) in enumerate(want, start=1):
        assert got[(0, rank)] == (doc, score), (rank, got)


def test_rare_term_outranks_common_term(spark):
    """A doc matching only a rare query term must beat a doc matching
    only a corpus-wide term (negative idf)."""
    from paper2llm_spark.operators.websearch import bm25_topk_frame

    docs = [(0, "rareword common stuff here"), (1, "rareword common x y")]
    docs += [(i, "common filler text") for i in range(2, 12)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = bm25_topk_frame(df).filter(F.col("query_id") == 0).collect()
    by_rank = {r["rank"]: r for r in rows}
    # query 0 terms: rareword, common, stuff
    assert by_rank[1]["doc_id"] == 0            # matches all three
    assert by_rank[2]["doc_id"] == 1            # rareword + common
    assert all(
        r["score_micro"] < by_rank[2]["score_micro"]
        for r in rows if r["rank"] > 2
    )  # common-only matches score below any rareword match


def test_topk_contract_and_tournament_exactness(spark):
    """<= K contiguous ranks per query, rank order follows
    (score desc, doc_id asc).  Tournament == direct-sort equivalence is
    covered by the DuckDB contract gate (the dual ranks with a single
    direct window)."""
    from paper2llm_spark.operators.websearch import K, bm25_topk

    out = bm25_topk(spark, SF).cache()
    try:
        per_q = out.groupBy("query_id").agg(
            F.count("*").alias("n"), F.max("rank").alias("mx"),
            F.min("rank").alias("mn"),
        ).collect()
        assert per_q, "no queries synthesized"
        for r in per_q:
            assert r["mn"] == 1 and r["mx"] == r["n"] <= K

        rows = out.collect()
        by_q: dict[int, list] = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        for q, rs in by_q.items():
            rs = sorted(rs, key=lambda r: r["rank"])
            keys = [(-r["score_micro"], r["doc_id"]) for r in rs]
            assert keys == sorted(keys), f"query {q} not sorted"
    finally:
        out.unpersist()
