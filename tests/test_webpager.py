"""Pagination chain reconstruction — hand-built chains through the
pointer-doubling ranker, plus planted-break invariants."""

from __future__ import annotations

from collections import defaultdict

from paper2llm_spark.operators.webpager import chain_frame, pagination_chains


def _page(url, nxt=None):
    head = f'<link rel="next" href="{nxt}">' if nxt else ""
    return (url, f"<html><head>{head}</head><body>x</body></html>"
            .encode())


def test_chain_ranking_hand_built(spark):
    pages = spark.createDataFrame(
        [
            _page("a/p0", "a/p1"), _page("a/p1", "a/p2"), _page("a/p2"),
            _page("b/p0"),                     # broken head: singleton
            _page("b/p1", "b/p2"), _page("b/p2"),
        ],
        "url string, html binary",
    )
    got = {r.url: (r.chain_tail, r.pos, r.chain_len)
           for r in chain_frame(pages).collect()}
    assert got["a/p0"] == ("a/p2", 0, 3)
    assert got["a/p1"] == ("a/p2", 1, 3)
    assert got["a/p2"] == ("a/p2", 2, 3)
    assert got["b/p0"] == ("b/p0", 0, 1)       # its own tail
    assert got["b/p1"] == ("b/p2", 0, 2)
    assert got["b/p2"] == ("b/p2", 1, 2)


def test_registered_chains_partition_cleanly(spark):
    rows = pagination_chains(spark, "/root/testdata/sf0.001").collect()
    chains = defaultdict(list)
    for r in rows:
        chains[r.chain_tail].append((r.pos, r.chain_len))
    lens = set()
    for tail, members in chains.items():
        ln = members[0][1]
        assert all(l == ln for _, l in members)
        assert sorted(p for p, _ in members) == list(range(ln))
        lens.add(ln)
    # planted breaks produce singletons; intact chains reach length 4
    assert 1 in lens and 4 in lens
