"""Link reciprocity: hand-built mutual/one-way graphs, exact shares,
both polarities on the blocked synthetic corpus graph."""

from __future__ import annotations

from paper2llm_spark.operators.webrecip import MICRO, reciprocity


def _frame(spark, edges):
    from paper2llm_spark.operators import webrecip

    nodes = spark.createDataFrame(
        sorted({(s,) for s, _ in edges} | {(d,) for _, d in edges}),
        "doc_id long",
    )
    e = spark.createDataFrame(edges, "src long, dst long")
    orig = webrecip._blocked_edges
    webrecip._blocked_edges = lambda _n: e
    try:
        return {
            r.doc_id: r
            for r in webrecip.reciprocity_frame(nodes).collect()
        }
    finally:
        webrecip._blocked_edges = orig


def test_mutual_and_oneway(spark):
    """0<->1 mutual; 0->2 one-way; 2->1 one-way.
    recip: 0 -> 1/2, 1 -> 1/1, 2 -> 0/1."""
    rows = _frame(spark, [(0, 1), (1, 0), (0, 2), (2, 1)])
    assert (rows[0].n_out, rows[0].n_recip) == (2, 1)
    assert rows[0].recip_micro == MICRO // 2
    assert (rows[1].n_out, rows[1].n_recip) == (1, 1)
    assert rows[1].recip_micro == MICRO
    assert (rows[2].n_out, rows[2].n_recip) == (1, 0)
    assert rows[2].recip_micro == 0


def test_corpus_both_polarities(spark):
    rows = reciprocity(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) >= 400
    micros = [r.recip_micro for r in rows]
    # blocked targeting makes back-edges ~K/G likely: some nodes
    # reciprocated, most not — both polarities present
    assert any(m > 0 for m in micros)
    assert any(m == 0 for m in micros)
    for r in rows:
        assert 0 <= r.n_recip <= r.n_out
