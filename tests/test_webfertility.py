"""Fertility by language — replay from the composed BPE apply and
rollup identities."""

from __future__ import annotations

import pandas as pd

from paper2llm_spark.operators.bpe import bpe_token_count
from paper2llm_spark.operators.webfertility import MICRO, fertility_by_lang

SF = "/root/testdata/sf0.001"


def test_replay_from_bpe_apply(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    meta = {int(d): (l, int(c)) for d, l, c in
            zip(docs["doc_id"], docs["lang"], docs["n_chars"])}
    per: dict[str, list] = {}
    for r in bpe_token_count(spark, SF).collect():
        lang, chars = meta[r.doc_id]
        d = per.setdefault(lang, [0, 0, 0, 0])
        d[0] += 1
        d[1] += r.n_words
        d[2] += r.bpe_tokens
        d[3] += chars
    rows = {r.lang: r for r in fertility_by_lang(spark, SF).collect()}
    assert set(rows) == set(per)
    for lang, (nd, w, t, c) in per.items():
        r = rows[lang]
        assert (r.n_docs, r.total_words, r.total_bpe_tokens,
                r.total_chars) == (nd, w, t, c)
        assert r.fertility_micro == t * MICRO // w
        assert r.tokens_per_kchar_micro == t * MICRO * 1000 // max(c, 1)
        # BPE splits some words: fertility strictly above 1 token/word
        assert r.fertility_micro > MICRO
    assert len(rows) > 1
