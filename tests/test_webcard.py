"""Corpus datasheet: hand-checked cell arithmetic, planted-dup rate,
share closure — semantics beyond the driver's hash gate."""

from __future__ import annotations

import hashlib

from paper2llm_spark.operators.webcard import (
    DUP_MOD,
    datasheet_frame,
    synth_release,
)


def test_cell_arithmetic_hand_checked(spark):
    docs = spark.createDataFrame(
        [
            (1, "one two three", "en", "s1", 13),
            (2, "one two three", "en", "s1", 13),   # exact dup
            (3, "four five", "en", "s1", 9),
            (4, "sechs sieben", "de", "s1", 12),
            (5, "eight", "en", "s2", 5),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {(r.source, r.lang): r
            for r in datasheet_frame(docs).collect()}
    c = rows[("s1", "en")]
    assert (c.n_docs, c.n_unique) == (3, 2)
    assert c.dup_rate_micro == 1_000_000 // 3
    assert c.tokens_total == 8 and c.chars_total == 35
    assert c.tokens_per_doc == 8 // 3
    assert c.docs_share_micro == (1_000_000 * 3) // 4
    d = rows[("s1", "de")]
    assert d.dup_rate_micro == 0
    assert d.docs_share_micro == 1_000_000 // 4
    assert rows[("s2", "en")].docs_share_micro == 1_000_000


def test_release_plants_exact_dup_rate(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    release = synth_release(docs)
    n = docs.count()
    planted = sum(
        1 for i in range(n)
        if int(hashlib.md5(f"{i}:card".encode()).hexdigest()[:15], 16)
        % DUP_MOD == 0
    )
    assert release.count() == n + planted
    rows = datasheet_frame(release).collect()
    assert sum(r.n_docs - r.n_unique for r in rows) == planted
    assert any(r.dup_rate_micro > 0 for r in rows)
    assert any(r.dup_rate_micro == 0 for r in rows)


def test_shares_sum_to_one_per_source(spark):
    from paper2llm_spark.operators.webcard import corpus_datasheet

    rows = corpus_datasheet(spark, "/root/testdata/sf0.001").collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source, cells in by_source.items():
        share = sum(c.docs_share_micro for c in cells)
        # integer-floor shares: within n_cells micro-units of 1.0
        assert 1_000_000 - len(cells) <= share <= 1_000_000, source
