"""Host components, Zipf/Heaps profile, SoftDeDup weights — semantics
beyond the driver's hash gate: planted component structure, OLS replay
against numpy lstsq, template spam down-weighting."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_host_components_planted_communities(spark):
    from paper2llm_spark.operators.webcomponents import (
        NC, host_components)

    rows = host_components(spark, SF).collect()
    comps = {}
    for r in rows:
        comps.setdefault(r.component, []).append(r)
    assert len(comps) == NC
    for comp, members in comps.items():
        # community label: every member host is the community's cN*
        # target or a source host linking into it
        prefix = comp[:2]           # 'c0'..'c4'
        assert all(
            m.host.startswith(prefix) or m.host.startswith("src")
            for m in members
        )
        # exactly one representative: the min host string
        reps = [m for m in members if m.is_rep == 1]
        assert len(reps) == 1 and reps[0].host == min(m.host for m in members)
        assert all(m.n_hosts == len(members) for m in members)


def test_host_components_two_disjoint_edges(spark):
    """Two disjoint links -> two components of size 2 each."""
    from paper2llm_spark.operators.webcomponents import (
        host_components_frame)

    pages = spark.createDataFrame(
        [
            ("https://a.test/1", b'<a href="https://b.test/x">r</a>'),
            ("https://c.test/1", b'<a href="https://d.test/x">r</a>'),
        ],
        "url string, html binary",
    )
    rows = {r.host: r for r in host_components_frame(pages).collect()}
    assert rows["a.test"].component == "a.test"
    assert rows["b.test"].component == "a.test"
    assert rows["c.test"].component == "c.test"
    assert rows["d.test"].component == "c.test"
    assert all(r.n_hosts == 2 for r in rows.values())


def test_zipf_matches_numpy_lstsq(spark):
    """The exact-bigint OLS must agree with numpy's float fit on the
    SAME quantized milli-nat points (and be in the right ballpark of
    the unquantized fit)."""
    import numpy as np

    from paper2llm_spark.operators.webzipf import zipf_profile_frame

    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    text = " ".join(w for i, w in enumerate(words) for _ in range(2 ** i))
    docs = spark.createDataFrame(
        [(1, text, "en")], "doc_id long, text string, lang string"
    )
    (row,) = zipf_profile_frame(docs).collect()
    assert row.n_terms == 6 and row.n_tokens == 63 and row.top_freq == 32

    freqs = sorted([2 ** i for i in range(6)], reverse=True)
    x = [math.floor(math.log(r) * 1000 + 0.5) for r in range(1, 7)]
    y = [math.floor(math.log(f) * 1000 + 0.5) for f in freqs]
    slope, intercept = np.polyfit(np.array(x, float), np.array(y, float), 1)
    assert abs(row.zipf_slope_micro / 1e6 - slope) < 2e-3
    assert abs(row.zipf_intercept_micro / 1e6 - intercept / 1000) < 2e-3
    # heaps single-point: ln 6 / ln 63
    assert row.heaps_beta_micro == math.floor(
        math.log(6) / math.log(63) * 1e6 + 0.5)


def test_zipf_corpus_slopes_negative(spark):
    from paper2llm_spark.operators.webzipf import zipf_profile

    rows = zipf_profile(spark, SF).collect()
    assert len(rows) >= 2
    assert all(r.zipf_slope_micro < 0 for r in rows)
    assert all(0 < r.heaps_beta_micro < 1_000_000 for r in rows)


def test_softdedup_downweights_template_spam(spark):
    """Ten copies of one template + one rare doc: the rare doc keeps
    weight 1e6, every template copy gets strictly less."""
    from paper2llm_spark.operators.websoft import softdedup_frame

    template = "the quick brown fox jumps over the lazy dog again today"
    rare = "completely unique narrative about obscure subject matter here"
    docs = spark.createDataFrame(
        [(i, template) for i in range(10)] + [(99, rare)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in softdedup_frame(docs).collect()}
    assert rows[99].weight_micro == 1_000_000
    assert all(rows[i].weight_micro < rows[99].weight_micro
               for i in range(10))
    # all template copies identical
    assert len({rows[i].weight_micro for i in range(10)}) == 1


def test_softdedup_short_doc_null_weight(spark):
    from paper2llm_spark.operators.websoft import softdedup_frame

    docs = spark.createDataFrame(
        [(1, "only two"), (2, "a longer document with trigrams in it")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in softdedup_frame(docs).collect()}
    assert rows[1].n_grams == 0 and rows[1].weight_micro is None
    assert rows[2].n_grams > 0 and rows[2].weight_micro is not None
