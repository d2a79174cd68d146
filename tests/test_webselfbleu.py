"""Self-BLEU — full Python replay over the sample and diversity
polarity."""

from __future__ import annotations

import pandas as pd

from paper2llm_spark.operators.webselfbleu import (
    MICRO, SAMPLE_EVERY, self_bleu,
)

SF = "/root/testdata/sf0.001"


def _grams(text: str, n: int) -> set:
    t = [x for x in text.lower().split() if x]
    if n == 1:
        return set(t)
    return {" ".join(t[i:i + 2]) for i in range(len(t) - 1)}


def test_full_python_replay(spark):
    df = pd.read_parquet(f"{SF}/documents.parquet")
    sample = {int(d): t for d, t in zip(df["doc_id"], df["text"])
              if d % SAMPLE_EVERY == 0}
    rows = {r.doc_id: r for r in self_bleu(spark, SF).collect()}
    assert set(rows) == set(sample)
    for n in (1, 2):
        gsets = {d: _grams(t, n) for d, t in sample.items()}
        df_tbl: dict[str, int] = {}
        for gs in gsets.values():
            for g in gs:
                df_tbl[g] = df_tbl.get(g, 0) + 1
        for d, gs in gsets.items():
            r = rows[d]
            matched = sum(1 for g in gs if df_tbl[g] >= 2)
            got_n = getattr(r, f"n_grams{n}")
            got_m = getattr(r, f"matched{n}")
            assert (got_n, got_m) == (len(gs), matched), (d, n)
            assert getattr(r, f"selfbleu{n}_micro") == \
                matched * MICRO // max(len(gs), 1)
    # the bigram metric actually separates docs on the fixture
    vals = {r.selfbleu2_micro for r in rows.values()}
    assert len(vals) > 1
    assert any(v < MICRO for v in vals)
