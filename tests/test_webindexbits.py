"""Posting-list bit accounting — full Python re-derivation of every
code length from the materialized index, plus code-theory sanity."""

from __future__ import annotations

from paper2llm_spark.operators.webindex import index_postings
from paper2llm_spark.operators.webindexbits import index_bits, index_bits_frame

SF = "/root/testdata/sf0.001"


def _bitlen(v: int) -> int:
    return v.bit_length()


def _gamma(v: int) -> int:
    return 2 * _bitlen(v) - 1


def _delta(v: int) -> int:
    b = _bitlen(v)
    return b - 1 + 2 * _bitlen(b) - 1


def _varint(v: int) -> int:
    return 8 * ((_bitlen(v) + 6) // 7)


def _rice(v: int, r: int) -> int:
    return ((v - 1) >> r) + 1 + r


def test_bits_match_python_rederivation_for_every_term(spark):
    post = {r.term: (r.df, r.gaps, r.tfs)
            for r in index_postings(spark, SF).collect()}
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    got = {r.term: r for r in index_bits(spark, SF).collect()}
    assert set(got) == set(post) and post

    for term, (df, gaps, tfs) in post.items():
        vs = [int(x) for x in gaps.split(",")]
        vs[0] += 1  # first gap is the raw doc_id: 1-based codespace
        ts = [int(x) for x in tfs.split(",")]
        r = max(0, _bitlen(n_docs // df) - 1)
        row = got[term]
        assert row.df == df
        assert row.bits_gamma == sum(_gamma(v) for v in vs), term
        assert row.bits_delta == sum(_delta(v) for v in vs), term
        assert row.bits_varint == sum(_varint(v) for v in vs), term
        assert row.bits_rice == sum(_rice(v, r) for v in vs), term
        assert row.bits_tf_gamma == sum(_gamma(t) for t in ts), term


def test_code_theory_sanity(spark):
    rows = index_bits(spark, SF).collect()
    assert rows
    for r in rows:
        # every code spends >= 1 bit per posting; varint >= 1 byte each
        assert r.bits_gamma >= r.df
        assert r.bits_varint >= 8 * r.df
        # delta beats gamma asymptotically but never by more than the
        # per-entry length-of-length overhead in either direction
        assert r.bits_delta <= 2 * r.bits_gamma
        assert r.bits_rice >= r.df  # unary quotient + stop bit


def test_hand_corpus_exact(spark):
    # three docs so 'a' (df 2) clears the 80%-of-N stop cap;
    # postings a: [(0,2),(2,1)], b: [(0,1)], c: [(5,1)]
    docs = spark.createDataFrame(
        [(0, "a a b"), (2, "a"), (5, "c")], "doc_id long, text string"
    )
    got = {r.term: r for r in index_bits_frame(docs).collect()}
    # a: gaps "0,2" -> vs [1, 2]; tfs [2, 1]; r = bitlen(3//2)-1 = 0
    assert got["a"].bits_gamma == _gamma(1) + _gamma(2)
    assert got["a"].bits_delta == _delta(1) + _delta(2)
    assert got["a"].bits_varint == 16
    assert got["a"].bits_rice == _rice(1, 0) + _rice(2, 0)
    assert got["a"].bits_tf_gamma == _gamma(2) + _gamma(1)
    # b: vs [1]; r = bitlen(3//1)-1 = 1
    assert got["b"].bits_rice == _rice(1, 1)
    # c: vs [6] (first gap is the raw doc_id 5, +1 codespace shift)
    assert got["c"].bits_gamma == _gamma(6)
    assert got["c"].bits_varint == 8
