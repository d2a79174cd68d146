"""Export-assembly columns (O1/O2) vs the oracle over fixture outputs."""

from __future__ import annotations

import pytest

from paper2llm_spark.operators.export import with_export_columns
from paper2llm_spark.oracle.export import (
    get_content_with_optional_bibtex,
    get_section_content,
)
from paper2llm_spark.pdf.fixtures import golden_outputs
from paper2llm_spark.plans.extract import extract_documents


@pytest.fixture(scope="module")
def exported(spark, fixture_pages_path):
    pages = spark.read.parquet(fixture_pages_path)
    out = with_export_columns(extract_documents(pages))
    return {r["url"]: r.asDict() for r in out.collect()}


def _oracle_sections(golden):
    return {
        "main_content": golden["main_content"],
        "backmatter": golden["backmatter"],
        "appendix": golden["appendix"],
        "title": golden["title"],
    }


def test_export_sections_match_oracle(exported):
    goldens = golden_outputs()
    for url, golden in goldens.items():
        got = exported[url]
        sections = _oracle_sections(golden)
        md = golden["markdown"]
        assert got["export_full"] == get_section_content(sections, md, "full"), url
        assert got["export_main"] == get_section_content(sections, md, "main"), url
        assert got["export_appendix"] == get_section_content(
            sections, md, "appendix", add_title=True
        ), url
        assert got["export_backmatter"] == get_section_content(
            sections, md, "backmatter", add_title=True
        ), url
        assert got["export_allparts"] == get_section_content(
            sections, md, "allparts", add_title=True
        ), url


def test_export_bibtex_prepend_matches_oracle(exported):
    goldens = golden_outputs()
    for url, golden in goldens.items():
        got = exported[url]
        sections = _oracle_sections(golden)
        expected = get_content_with_optional_bibtex(
            sections, golden["markdown"], "full", include_bibtex=True
        )
        assert got["export_full_bibtex"] == expected, url
