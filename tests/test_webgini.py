"""Host-traffic Gini — full Python re-derivation on the fixture and
closed-form sanity."""

from __future__ import annotations

import hashlib

import pandas as pd

from paper2llm_spark.operators.webgini import (
    CR_K, MICRO, N_HOSTS, host_gini, host_gini_frame,
)

SF = "/root/testdata/sf0.001"


def _host(source: str, doc_id: int) -> str:
    h = int(hashlib.md5(f"{doc_id}:wh".encode()).hexdigest()[:15], 16)
    return f"{source}-h{h % N_HOSTS}"


def _expected(df: pd.DataFrame) -> tuple:
    traffic: dict[str, int] = {}
    for doc_id, source, n_chars in zip(df["doc_id"], df["source"],
                                       df["n_chars"]):
        h = _host(source, int(doc_id))
        traffic[h] = traffic.get(h, 0) + int(n_chars)
    xs = sorted(traffic.items(), key=lambda kv: (kv[1], kv[0]))
    n, t = len(xs), sum(x for _, x in xs)
    s1 = sum(i * x for i, (_, x) in enumerate(xs, start=1))
    gini = (2 * s1 - (n + 1) * t) * MICRO // (n * t)
    cr1 = sum(x for _, x in xs[-1:]) * MICRO // t
    cr10 = sum(x for _, x in xs[-CR_K:]) * MICRO // t
    return n, t, gini, cr1, cr10


def test_fixture_full_python_rederivation(spark):
    df = pd.read_parquet(f"{SF}/documents.parquet")
    row = host_gini(spark, SF).collect()[0]
    n, t, gini, cr1, cr10 = _expected(df)
    assert (row.n_hosts, row.total_bytes) == (n, t)
    assert row.gini_micro == gini
    assert (row.cr1_micro, row.cr10_micro) == (cr1, cr10)
    assert 0 < row.gini_micro < MICRO
    assert 0 < row.cr1_micro <= row.cr10_micro <= MICRO


def test_uniform_traffic_gini_zero(spark):
    # one doc per synthesized host with identical byte volume -> every
    # host's x equal -> Gini exactly 0, CR-k = k/n shares
    rows, seen = [], set()
    doc_id = 0
    while len(seen) < 6:
        h = _host("s", doc_id)
        if h not in seen:
            seen.add(h)
            rows.append((doc_id, "s", 100))
        doc_id += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )
    got = host_gini_frame(docs).collect()[0]
    assert got.n_hosts == 6 and got.gini_micro == 0
    assert got.cr1_micro == MICRO // 6
