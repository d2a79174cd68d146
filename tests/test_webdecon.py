"""Composed decontamination funnel — first-tripped-tier attribution
over hand-built corpora (exact / ngram / semantic / clean)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from paper2llm_spark.operators.webdecon import (
    BENCH_MOD, P2_BASE, P3_BASE, decontaminate_funnel,
)


@pytest.fixture(scope="module")
def funnel_rows(spark):
    rows = decontaminate_funnel(spark, "/root/testdata/sf0.001").collect()
    return {r.doc_id: r for r in rows}


def test_benchmark_docs_trip_exact_by_self_match(funnel_rows):
    bench = [r for i, r in funnel_rows.items()
             if i < P2_BASE and i % BENCH_MOD == 0]
    assert bench and all(r.verdict == "exact" for r in bench)
    # stage-not-reached sentinels, never NULL ints
    assert all((r.n_grams, r.gram_hits, r.cos4) == (-1, -1, -1.0)
               for r in bench)


def test_planted_prefix_variant_stops_at_ngram_tier(funnel_rows):
    p2 = [r for i, r in funnel_rows.items()
          if P2_BASE <= i < P3_BASE]
    assert p2 and all(r.verdict == "ngram" for r in p2)
    # 'zq ' prefix adds exactly one 4-gram; every original gram hits
    assert all(r.n_grams - r.gram_hits == 1 for r in p2)
    assert all(r.cos4 == -1.0 for r in p2)


def test_planted_reversed_variant_falls_through_to_semantic(funnel_rows):
    p3 = [r for i, r in funnel_rows.items() if i >= P3_BASE]
    assert p3 and all(r.verdict == "semantic" for r in p3)
    # same vec by orig key -> its own eval vector matches at cos 1.0
    assert all(r.cos4 == 1.0 for r in p3)


def test_clean_majority_and_verdict_partition(funnel_rows):
    verdicts = {r.verdict for r in funnel_rows.values()}
    assert verdicts == {"exact", "ngram", "semantic", "clean"}
    clean = [r for r in funnel_rows.values() if r.verdict == "clean"]
    assert len(clean) > len(funnel_rows) / 2
    # every doc appears exactly once (the funnel is a partition)
    assert len(funnel_rows) == 500 + 2 * len(
        [i for i in range(500) if i % BENCH_MOD == 0]
    )
