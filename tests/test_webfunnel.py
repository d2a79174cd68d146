"""Composed quality funnel — semantic checks beyond the driver's
hash-vs-DuckDB gate (tests/test_driver_contract.py covers that)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from paper2llm_spark.operators.webfunnel import (
    DUP_MOD,
    DUP_OFFSET,
    FUNNEL_CAP_K,
    quality_funnel,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def funnel(spark):
    return quality_funnel(spark, SF).cache()


def test_every_input_doc_gets_exactly_one_row(spark, funnel):
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    n_dups = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") % DUP_MOD == 0)
        .count()
    )
    assert funnel.count() == n_docs + n_dups
    assert funnel.select("doc_id").distinct().count() == n_docs + n_dups


def test_planted_copies_never_selected_over_originals(funnel):
    """A planted copy shares its original's text, so whenever both are
    candidates the window min must crown the original (lower doc_id):
    no copy may ever be canonical or selected."""
    copies = funnel.filter(F.col("doc_id") >= DUP_OFFSET)
    assert copies.count() > 0
    assert copies.filter("selected").count() == 0
    assert copies.filter(F.col("doc_id") == F.col("canon_id")).count() == 0
    # every candidate copy is labeled at the duplicate stage
    cand_copies = copies.filter("gopher_keep AND c4_keep AND clf_keep")
    assert cand_copies.count() > 0
    stages = {r.stage for r in cand_copies.select("stage").distinct().collect()}
    assert stages == {"duplicate"}


def test_domain_cap_binds(funnel):
    per_source = (
        funnel.filter("selected").groupBy("source").count().collect()
    )
    assert per_source, "no source selected anything"
    assert all(r["count"] <= FUNNEL_CAP_K for r in per_source)


def test_stage_label_consistent_with_selected(funnel):
    assert funnel.filter(
        (F.col("stage") == "selected") != F.col("selected")
    ).count() == 0


def test_funnel_discriminates(funnel):
    """The gate is meaningless if any flag column is constant."""
    for col in ("gopher_keep", "clf_keep", "selected"):
        assert funnel.select(col).distinct().count() == 2, col
    # c4_keep blocks no doc *after* gopher on this corpus, but the
    # column itself must still carry both polarities into the hash
    assert funnel.select("c4_keep").distinct().count() == 2
