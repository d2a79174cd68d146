"""End-to-end Spark pipeline vs oracle goldens — the byte-identical gate.

BASELINE.json metric: "byte-identical Markdown match-rate on the fixture
corpus"; target 100% of urls, both branches.
"""

from __future__ import annotations

import pytest

from paper2llm_spark.pdf.fixtures import fixture_docs, golden_outputs
from paper2llm_spark.plans.extract import extract_documents


def _collect_results(spark, fixture_pages_path, mode):
    pages = spark.read.parquet(fixture_pages_path)
    out = extract_documents(pages, mode=mode, chunk_pages=16)
    return {r["url"]: r.asDict() for r in out.collect()}


@pytest.fixture(scope="module")
def placeholder_results(spark, fixture_pages_path):
    return _collect_results(spark, fixture_pages_path, "placeholder")


def test_byte_identical_markdown_placeholder_branch(placeholder_results):
    goldens = golden_outputs(process_images=False)
    assert goldens, "no goldens generated"
    mismatches = []
    for url, golden in goldens.items():
        got = placeholder_results.get(url)
        if got is None:
            mismatches.append((url, "MISSING", None))
            continue
        if got["markdown"] != golden["markdown"]:
            mismatches.append((url, golden["markdown"], got["markdown"]))
    assert not mismatches, f"{len(mismatches)} markdown mismatches: " + "\n\n".join(
        f"URL {u}\n--- golden ---\n{g!r}\n--- spark ---\n{s!r}"
        for u, g, s in mismatches[:3]
    )


def test_byte_identical_sections_and_bibtex(placeholder_results):
    goldens = golden_outputs(process_images=False)
    for url, golden in goldens.items():
        got = placeholder_results[url]
        assert got["main_content"] == golden["main_content"], url
        assert got["backmatter"] == golden["backmatter"], url
        assert got["appendix"] == golden["appendix"], url
        assert got["title"] == golden["title"], url
        assert got["bibtex"] == golden["bibtex"], url
        assert got["bibtex_key"] == golden["bibtex_key"], url
        assert got["bibtex_formatted"] == golden["bibtex_formatted"], url
        assert got["page_count"] == golden["page_count"], url
        assert list(got["image_references"]) == golden["image_references"], url
        assert got["model"] == golden["model"], url


def test_byte_identical_markdown_descriptions_branch(spark, fixture_pages_path):
    results = _collect_results(spark, fixture_pages_path, "descriptions")
    goldens = golden_outputs(process_images=True)
    for url, golden in goldens.items():
        assert results[url]["markdown"] == golden["markdown"], url


def test_quarantine_rows_carry_err_and_never_kill_job(placeholder_results):
    # X1 garbage pdf payload: parse error surfaced on the row
    x1 = placeholder_results.get("https://fixtures.test/error/x1")
    assert x1 is not None and x1["err"] is not None
    assert x1["markdown"] is None
    # X2 non-en: filtered before parse — absent from output
    assert "https://fixtures.test/error/x2" not in placeholder_results
    # X3 empty + X4 junk payloads: dropped by payload detection
    assert "https://fixtures.test/error/x3" not in placeholder_results
    assert "https://fixtures.test/error/x4" not in placeholder_results


def test_skew_split_byte_identical(spark, fixture_pages_path):
    """A6 regression at the pipeline level: chunked parse (page ranges)
    and whole-doc parse produce identical bytes for the 40-page doc."""
    pages = spark.read.parquet(fixture_pages_path).filter(
        "url = 'https://fixtures.test/assemble/a6-large'"
    )
    whole = extract_documents(pages, chunk_pages=1000).collect()[0]
    # giant_bytes=0 forces every doc through the chunk-split path
    split4 = extract_documents(pages, chunk_pages=4, giant_bytes=0).collect()[0]
    assert whole["markdown"] == split4["markdown"]
    assert whole["page_count"] == split4["page_count"] == 40


def test_all_en_parsable_urls_present(placeholder_results):
    expected = {
        d["url"] for d in fixture_docs() if d["lang"] == "en"
    } - {
        "https://fixtures.test/error/x3",  # empty payload
        "https://fixtures.test/error/x4",  # junk payload
    }
    assert set(placeholder_results) == expected
