"""Semantic tests for the web-graph PageRank operator.

The strongest check is an exact replay: the synthetic edge derivation
and the integer-arithmetic iteration are both deterministic, so a pure
Python replica (hashlib md5 for the portable hash, floor division for
the micro-unit updates) must reproduce the Spark output bit-for-bit.
Cross-engine equality vs DuckDB is covered by test_driver_contract.py.
"""

from __future__ import annotations

import hashlib

from paper2llm_spark.operators.webgraph import (
    PR_BASE,
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_INIT,
    PR_ITERS,
    PR_OUT_K,
    pagerank_frame,
    synth_edges,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_pagerank(n: int) -> dict[int, int]:
    edges = set()
    for src in range(n):
        for k in range(PR_OUT_K):
            dst = _h60(f"{src}:{k}") % n
            if dst != src:
                edges.add((src, dst))
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    ranks = {i: PR_INIT for i in range(n)}
    for _ in range(PR_ITERS):
        sums: dict[int, int] = {}
        for s, d in edges:
            sums[d] = sums.get(d, 0) + ranks[s] // deg[s]
        ranks = {
            i: PR_BASE + (PR_DAMP_NUM * sums.get(i, 0)) // PR_DAMP_DEN
            for i in range(n)
        }
    return ranks


def _spark_pagerank(spark, n: int) -> dict[int, int]:
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id bigint")
    out = pagerank_frame(nodes, synth_edges(nodes, n))
    return {r["doc_id"]: r["rank_micro"] for r in out.collect()}


def test_pagerank_matches_pure_python_replay_exactly(spark):
    n = 40
    assert _spark_pagerank(spark, n) == _py_pagerank(n)


def test_pagerank_unlinked_node_holds_base_mass(spark):
    # replay to find a node with no inlinks at n=40; if none exists the
    # assertion below still verifies every rank >= the base mass
    n = 40
    ranks = _spark_pagerank(spark, n)
    py = _py_pagerank(n)
    assert all(v >= PR_BASE for v in ranks.values())
    sinks = [i for i in range(n) if py[i] == PR_BASE]
    for i in sinks:
        assert ranks[i] == PR_BASE


def test_synth_edges_no_self_loops_and_bounded_outdegree(spark):
    n = 25
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id bigint")
    rows = synth_edges(nodes, n).collect()
    assert all(r["src"] != r["dst"] for r in rows)
    assert all(0 <= r["dst"] < n for r in rows)
    from collections import Counter

    outdeg = Counter(r["src"] for r in rows)
    assert max(outdeg.values()) <= PR_OUT_K


def test_outlinks_frame_counts_host_pairs(spark):
    from paper2llm_spark.operators.webgraph import outlinks_frame

    html1 = (b'<html><body><p>x</p>'
             b'<a href="https://a.test/1">r</a>'
             b'<a href="https://a.test/2">r</a>'
             b'<a href="https://b.test/3">r</a></body></html>')
    html2 = b'<html><body><p>no links</p></body></html>'
    pages = spark.createDataFrame(
        [("https://s.test/1", html1), ("https://s.test/2", html2)],
        "url string, html binary",
    )
    rows = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in outlinks_frame(pages).collect()
    }
    assert rows == {("s.test", "a.test"): 2, ("s.test", "b.test"): 1}


def test_outlinks_frame_handles_real_crawl_anchor_shapes(spark):
    """Real crawl HTML: single-quoted hrefs, attributes before href,
    uppercase tags (ADVICE r2 — the old pattern only matched
    '<a href=\"...\"')."""
    from paper2llm_spark.operators.webgraph import outlinks_frame

    html = (b"<html><body>"
            b"<a class='nav' id='x' href='https://a.test/sq'>s</a>"
            b'<A HREF="https://b.test/up">u</A>'
            b'<a rel="nofollow" \n   href = "https://c.test/ws">w</a>'
            b'<a name="anchor-no-href">none</a>'
            b"</body></html>")
    pages = spark.createDataFrame(
        [("https://s.test/1", html)], "url string, html binary"
    )
    rows = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in outlinks_frame(pages).collect()
    }
    assert rows == {
        ("s.test", "a.test"): 1,
        ("s.test", "b.test"): 1,
        ("s.test", "c.test"): 1,
    }


def test_hits_exact_integer_rounds(spark):
    """Replay the exact-integer HITS arithmetic on a 4-node graph:
    1->3, 2->3, 3->4 (node 3 is the authority, 1/2 are hubs)."""
    from paper2llm_spark.operators.webgraph import (
        HITS_ITERS, HITS_SCALE, hits_frame,
    )

    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "doc_id bigint")
    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 4)], "src bigint, dst bigint"
    )
    out = {
        r["doc_id"]: (r["hub_micro"], r["auth_micro"])
        for r in hits_frame(nodes, edges).collect()
    }

    hub = {i: HITS_SCALE for i in (1, 2, 3, 4)}
    es = [(1, 3), (2, 3), (3, 4)]
    for _ in range(HITS_ITERS):
        raw_a = {i: sum(hub[s] for s, d in es if d == i) for i in hub}
        mx = max(max(raw_a.values()), 1)
        auth = {i: raw_a[i] * HITS_SCALE // mx for i in hub}
        raw_h = {i: sum(auth[d] for s, d in es if s == i) for i in hub}
        mx = max(max(raw_h.values()), 1)
        hub = {i: raw_h[i] * HITS_SCALE // mx for i in hub}
    assert out == {i: (hub[i], auth[i]) for i in (1, 2, 3, 4)}
    # structural sanity: 3 is the top authority, 1 and 2 the top hubs
    assert out[3][1] == HITS_SCALE and out[1][0] == out[2][0] == HITS_SCALE
