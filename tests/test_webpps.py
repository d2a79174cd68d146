"""Systematic PPS host sampling — exact-K conservation, Python
replay, and a hand-ratio corpus."""

from __future__ import annotations

import hashlib

import pandas as pd

from paper2llm_spark.operators.webgini import N_HOSTS
from paper2llm_spark.operators.webpps import (
    K_DRAWS, MICRO, pps_sample, pps_sample_frame,
)

SF = "/root/testdata/sf0.001"


def _host(source: str, doc_id: int) -> str:
    h = int(hashlib.md5(f"{doc_id}:wh".encode()).hexdigest()[:15], 16)
    return f"{source}-h{h % N_HOSTS}"


def _expected(traffic: dict[str, int], k: int) -> dict[str, int]:
    hosts = sorted(traffic)
    t = sum(traffic.values())
    sh = k * t - 1 - t // 2
    out, cum = {}, 0
    for h in hosts:
        x = traffic[h]
        m = (k * (cum + x) + sh) // t - (k * cum + sh) // t
        if m >= 1:
            out[h] = m
        cum += x
    return out


def test_fixture_python_replay_and_k_conservation(spark):
    df = pd.read_parquet(f"{SF}/documents.parquet")
    traffic: dict[str, int] = {}
    for doc_id, source, n_chars in zip(df["doc_id"], df["source"],
                                       df["n_chars"]):
        h = _host(source, int(doc_id))
        traffic[h] = traffic.get(h, 0) + int(n_chars)
    want = _expected(traffic, K_DRAWS)
    got = {r.host: r for r in pps_sample(spark, SF).collect()}
    assert {h: r.multiplicity for h, r in got.items()} == want
    # the K draws are fully allocated — the telescoping identity
    assert sum(r.multiplicity for r in got.values()) == K_DRAWS
    t = sum(traffic.values())
    for h, r in got.items():
        assert r.bytes == traffic[h]
        assert r.incl_exp_micro == K_DRAWS * traffic[h] * MICRO // t


def test_hand_ratio_corpus(spark):
    # two hosts with 3:1 byte traffic and K=50 -> multiplicities land
    # proportionally (37/38 vs 12/13 depending on the draw grid)
    rows, sizes = [], {}
    doc_id = 0
    while len(sizes) < 2:
        h = _host("s", doc_id)
        if h not in sizes:
            sizes[h] = 300 if not sizes else 100
            rows.append((doc_id, "s", sizes[h]))
        doc_id += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )
    got = {r.host: r.multiplicity
           for r in pps_sample_frame(docs).collect()}
    assert got == _expected(sizes, K_DRAWS)
    assert sum(got.values()) == K_DRAWS
    big, small = max(sizes, key=sizes.get), min(sizes, key=sizes.get)
    assert got[big] > got[small] >= 1
    assert abs(got[big] - 3 * got[small]) <= 2
