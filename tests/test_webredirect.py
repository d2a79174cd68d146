"""Redirect-chain resolution — f^8 semantics: chain landing + hop
counts, absorbing terminals, loop detection, and the planted corpus
shapes."""

from __future__ import annotations

from paper2llm_spark.operators.webredirect import (
    redirect_chains, resolve_chains_frame,
)

SF = "/root/testdata/sf0.001"


def _resolve(spark, urls, edges):
    u = spark.createDataFrame([(x,) for x in urls], "url string")
    e = spark.createDataFrame(edges, "src string, dst string")
    return {r.url: r for r in resolve_chains_frame(u, e).collect()}


def test_chain_lands_on_terminal_with_exact_hops(spark):
    urls = ["a", "b", "c", "d"]
    out = _resolve(spark, urls, [("a", "b"), ("b", "c"), ("c", "d")])
    assert (out["a"].final_url, out["a"].hops, out["a"].resolved) == ("d", 3, True)
    assert (out["b"].final_url, out["b"].hops) == ("d", 2)
    assert (out["c"].final_url, out["c"].hops) == ("d", 1)
    assert "d" not in out  # terminals are not emitted


def test_two_cycle_reports_unresolved_after_8_moves(spark):
    out = _resolve(spark, ["x", "y"], [("x", "y"), ("y", "x")])
    # 8 moves around a 2-cycle returns to the start
    assert (out["x"].final_url, out["x"].hops, out["x"].resolved) == ("x", 8, False)
    assert (out["y"].final_url, out["y"].resolved) == ("y", False)


def test_chain_into_loop_is_unresolved(spark):
    out = _resolve(spark, ["a", "x", "y"],
                   [("a", "x"), ("x", "y"), ("y", "x")])
    r = out["a"]
    assert r.hops == 8 and not r.resolved
    # 1 move to x, then 7 around the cycle -> lands on y
    assert r.final_url == "y"


def test_corpus_plants_chains_and_cycles(spark):
    out = {r.url: r for r in redirect_chains(spark, SF).collect()}
    # doc 3 -> 2 -> 1 -> 0 (terminal)
    r3 = out["https://r.test/3"]
    assert (r3.final_url, r3.hops, r3.resolved) == ("https://r.test/0", 3, True)
    # docs 95/96 form a 2-cycle
    r95 = out["https://r.test/95"]
    assert r95.hops == 8 and not r95.resolved
