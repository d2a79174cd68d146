"""Semantic decontamination — the self-leak guarantee (eval sources
present in the training pool flag at cosine 1.0) and the nearest-eval
assignment."""

from __future__ import annotations

from paper2llm_spark.operators.websemdecon import (
    CONTAM_COS4, EVAL_MOD, semantic_decontaminate,
)

SF = "/root/testdata/sf0.001"


def test_eval_sources_flag_at_cos_one(spark):
    rows = {r.vec_id: r for r in semantic_decontaminate(spark, SF).collect()}
    evals = {v: r for v, r in rows.items() if v % EVAL_MOD == 0}
    assert len(evals) == 10  # 500 fixture vectors / 50
    for v, r in evals.items():
        assert r.eval_id == v and r.cos4 == 1.0 and r.contaminated


def test_every_vector_gets_exactly_one_verdict(spark):
    rows = semantic_decontaminate(spark, SF).collect()
    assert len(rows) == 500
    assert len({r.vec_id for r in rows}) == 500
    for r in rows:
        assert r.contaminated == (r.cos4 >= CONTAM_COS4)
