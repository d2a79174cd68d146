"""Winnowing fingerprints — semantics beyond the driver's hash gate:
pure-Python replay, the winnowing guarantee, rightmost tie-break."""

from __future__ import annotations

import hashlib

SF = "/root/testdata/sf0.001"


def _h(toks: list[str]) -> int:
    return int(
        hashlib.md5("\x1f".join(toks).encode()).hexdigest()[:15], 16
    )


def _py_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    toks = [t for t in text.lower().split() if t]
    gh = [_h(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    if len(gh) < w:
        return set()
    sel = set()
    for j in range(len(gh) - w + 1):
        win = gh[j:j + w]
        mv = min(win)
        # rightmost min
        pos = j + max(i for i, v in enumerate(win) if v == mv)
        sel.add((pos + 1, mv))  # 1-based positions, matching the operator
    return sel


def _spark_winnow(spark, docs):
    from paper2llm_spark.operators.webwinnow import winnow_fingerprints_frame

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {}
    for r in winnow_fingerprints_frame(df).collect():
        out.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    return out


def test_matches_python_replay(spark):
    from paper2llm_spark.operators.webwinnow import K_GRAM, W_WIN

    docs = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "a b a b a b a b a b a b"),          # heavy ties
        (2, "one two three"),                    # < k+w-1: no fingerprints
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    got = _spark_winnow(spark, docs)
    for d, text in docs:
        assert got.get(d, set()) == _py_winnow(text, K_GRAM, W_WIN), d


def test_rightmost_tie_break(spark):
    """A perfectly periodic doc makes every window's grams identical:
    every window must select its RIGHTMOST slot (robust winnowing),
    which the replay asserts position-exactly above; here check the
    selected positions advance one per window."""
    from paper2llm_spark.operators.webwinnow import K_GRAM, W_WIN

    text = " ".join(["x"] * 12)   # all grams equal
    got = _spark_winnow(spark, [(0, text)])[0]
    n_grams = 12 - K_GRAM + 1
    want_pos = {j + W_WIN - 1 + 1 for j in range(n_grams - W_WIN + 1)}
    assert {p for p, _ in got} == want_pos


def test_winnowing_guarantee(spark):
    """Any shared run of >= W + K - 1 tokens between two docs shares at
    least one (fp) fingerprint — the paper's correctness property."""
    from paper2llm_spark.operators.webwinnow import K_GRAM, W_WIN

    shared = " ".join(f"s{i}" for i in range(W_WIN + K_GRAM - 1))
    docs = [
        (0, f"u1 u2 u3 {shared} u4 u5 u6 u7"),
        (1, f"v1 v2 v3 v4 v5 v6 {shared} v7 v8"),
        (2, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
    ]
    got = _spark_winnow(spark, docs)
    fps = {d: {fp for _, fp in s} for d, s in got.items()}
    assert fps[0] & fps[1], "guarantee violated: no shared fingerprint"
    assert not (fps[0] & fps.get(2, set()))
    assert not (fps[1] & fps.get(2, set()))


def test_corpus_density(spark):
    """Expected selection density is 2/(W+1) per gram position; allow a
    generous band around it corpus-wide."""
    from paper2llm_spark.operators.webwinnow import (
        K_GRAM, W_WIN, winnow_fingerprints,
    )
    import duckdb

    n_sel = winnow_fingerprints(spark, SF).count()
    n_grams = duckdb.sql(
        f"SELECT sum(greatest(len(list_filter(string_split_regex(lower(text),"
        f" '\\s+'), x -> length(x) > 0)) - {K_GRAM} + 1, 0)) FROM"
        f" '{SF}/documents.parquet'"
    ).fetchone()[0]
    density = n_sel / n_grams
    assert 0.5 * 2 / (W_WIN + 1) < density < 2.0 * 2 / (W_WIN + 1), density


def test_pairs_rank_true_near_dups_first(spark):
    """Two docs sharing a long run must pair with a higher n_shared
    than docs sharing only the minimum run; unrelated docs don't pair."""
    from paper2llm_spark.operators.webwinnow import winnow_pairs_frame

    long_shared = " ".join(f"L{i}" for i in range(30))
    short_shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 s12"
    docs = [
        (0, f"a1 a2 {long_shared} a3 a4"),
        (1, f"b1 b2 b3 {long_shared} b4"),
        (2, f"c1 c2 {short_shared} c3 c4 c5 c6 c7 c8"),
        (3, f"d1 d2 d3 d4 {short_shared} d5 d6 d7 d8"),
        (4, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 e11 e12 e13 e14"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]): r["n_shared"]
           for r in winnow_pairs_frame(df).collect()}
    assert (0, 1) in got and (2, 3) in got
    assert got[(0, 1)] > got[(2, 3)]
    assert all(4 not in p for p in got)


def test_pairs_df_cap_drops_boilerplate(spark):
    """A fingerprint shared by > DF_CAP docs must not generate pairs
    (no quadratic blowup on boilerplate)."""
    from paper2llm_spark.operators.webwinnow import DF_CAP, winnow_pairs_frame

    boiler = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"
    docs = [(i, f"u{i}a u{i}b {boiler} u{i}c") for i in range(DF_CAP + 5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    assert winnow_pairs_frame(df).count() == 0
