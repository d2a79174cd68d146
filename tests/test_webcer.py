"""CER audit — hand channel replay, sampled Python Levenshtein
re-derivation, and rate identities."""

from __future__ import annotations

import pandas as pd

from paper2llm_spark.operators.webcer import MICRO, cer_audit, cer_audit_frame


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _channel(ref: str) -> str:
    return ref.replace("u", "v").replace("th", "t")


def test_hand_channel_replay(spark):
    docs = spark.createDataFrame(
        [(0, "the umbrella"), (1, "crisp"), (2, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in cer_audit_frame(docs).collect()}
    # "the umbrella" -> "te vmbrella": one 'h' deletion + one u->v sub
    assert got[0].n_chars == 12
    assert got[0].edit_dist == _lev("the umbrella", "te vmbrella") == 2
    assert got[0].cer_micro == 2 * MICRO // 12
    # channel no-ops leave zero distance; empty doc guarded
    assert got[1].edit_dist == 0 and got[1].cer_micro == 0
    assert got[2] .n_chars == 0 and got[2].cer_micro == 0


def test_sampled_python_rederivation(spark):
    df = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    rows = {r.doc_id: r
            for r in cer_audit(spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == set(int(d) for d in df["doc_id"])
    checked = 0
    for doc_id, text in zip(df["doc_id"], df["text"]):
        if doc_id % 10:
            continue
        r = rows[int(doc_id)]
        dist = _lev(text, _channel(text))
        assert r.n_chars == len(text)
        assert r.edit_dist == dist, doc_id
        assert r.cer_micro == dist * MICRO // max(len(text), 1)
        checked += 1
    assert checked >= 10
    # the channel actually corrupts part of the corpus
    assert any(r.edit_dist > 0 for r in rows.values())
