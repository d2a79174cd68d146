"""Oracle tests: BibTeX (F-BIBTEX B1-B4) and export assembly (F-EXPORT)."""

from paper2llm_spark.oracle.bibtex import (
    compare_titles,
    format_bibtex_entry,
    generate_bibtex_from_title,
    generate_bibtex_key,
    generate_mock_bibtex_entry,
    normalize_title_for_comparison,
    sanitize_bibtex_text,
)
from paper2llm_spark.oracle.export import (
    calculate_image_metrics,
    get_content_with_optional_bibtex,
    get_section_content,
)
from paper2llm_spark.oracle.splitter import split_markdown_content


def test_sanitize_specials_and_whitespace_quirk():
    # the \s-in-class quirk: space maps to itself, \n and \t get escaped
    assert sanitize_bibtex_text("a&b") == "a\\&b"
    assert sanitize_bibtex_text("x y") == "x y"
    assert sanitize_bibtex_text("x\ty") == "x\\\ty"
    assert sanitize_bibtex_text("x\ny") == "x\\\ny"
    assert sanitize_bibtex_text("100%_{}#$~^\\") == "100\\%\\_\\{\\}\\#\\$\\~\\^\\\\"
    assert sanitize_bibtex_text("“q” ‘s’ — –") == "``q`` ''s'' --- --"


def test_key_generation_stopwords():
    key = generate_bibtex_key("On the Convergence of Things", ["Ada Lovelace"], "2026")
    assert key == "lovelace2026convergence"


def test_key_generation_fallback_first_word():
    key = generate_bibtex_key("An of the", ["Bo Li"], "2025")
    assert key == "li2025an"


def test_mock_entry_fields():
    e = generate_mock_bibtex_entry("Some Paper Title")
    assert e["authors"] == ["Author, Example"]
    assert e["journal"] == "Journal of Important Research"
    assert e["volume"] == "1" and e["issue"] == "1" and e["pages"] == "1--10"
    assert e["key"] == "example2026some"


def test_mock_path_returns_empty_bibtex_but_populated_validation():
    r = generate_bibtex_from_title("A Paper About Stuff")
    assert r["bibtex"] == ""
    assert r["used_mock_entry"] is True
    assert r["title_validation"]["matches"] is False
    assert r["formatted_entry"].startswith("@article{example2026paper,")
    assert r["formatted_entry"].endswith("\n}")


def test_format_entry_field_order_and_trailing_comma():
    e = {
        "key": "k1", "type": "article", "title": "T", "authors": ["A B"],
        "year": "2020", "journal": "J", "note": "extra",
    }
    s = format_bibtex_entry(e)
    assert s == (
        "@article{k1,\n  title={T},\n  author={A B},\n  year={2020},\n"
        "  journal={J},\n  note={extra}\n}"
    )


def test_title_comparison_short_exact_long_overlap():
    # short titles: exact equality on normalized form
    assert compare_titles("Short", "Short!")["matches"] is True
    assert compare_titles("Short", "Other")["matches"] is False
    # long titles: >0.75 word overlap; duplicates counted on original side
    a = "the quick brown fox jumps over lazy dog"
    assert compare_titles(a, a)["matches"] is True
    assert compare_titles(a, "quick brown fox jumps over lazy dog extra")["matches"] is True
    assert compare_titles(a, "entirely different words here now ok yes")["matches"] is False


def test_normalize_title():
    assert normalize_title_for_comparison("The Quick-Brown FOX! 2024") == "the quickbrown fox"


def test_section_content_allparts_order_appendix_before_backmatter():
    doc = "# T\n\nmain\n\n## References\n\n[1]\n\n## Appendix\n\nxx"
    sections = split_markdown_content(doc)
    out = get_section_content(sections, doc, "allparts", add_title=True)
    i_main = out.index("main")
    i_app = out.index("# T - Appendix\n\n---\n\n")
    i_back = out.index("# T - Backmatter\n\n---\n\n")
    assert i_main < i_app < i_back


def test_section_content_with_title_header():
    doc = "# T\n\nmain\n\n## Appendix\n\nxx"
    sections = split_markdown_content(doc)
    out = get_section_content(sections, doc, "appendix", add_title=True)
    assert out.startswith("# T - Appendix\n\n---\n\n## Appendix")


def test_bibtex_prepend_fallback_mock_citation():
    doc = "# My Long Paper Title\n\nbody content here"
    sections = split_markdown_content(doc)
    out = get_content_with_optional_bibtex(sections, doc, "full", True)
    # pipeline generator is the mock -> empty bibtex -> dated fallback block
    assert out.startswith("```\n% WARNING: This is a fallback mock citation.\n")
    assert "% Generated: 2026-01-01\n" in out
    assert "@article{unknownYear," in out
    assert out.endswith(f"```\n\n---\n\n{doc}".replace("```\n\n", "```\n\n", 1)[-len(doc) - 9:])


def test_bibtex_pregenerated_with_mismatch_warning():
    doc = "# T\n\nbody"
    sections = split_markdown_content(doc)
    result = {
        "bibtex": "@article{x,\n  title={T}\n}",
        "bibtex_title_validation": {
            "matches": False, "original_title": "T", "bibtex_title": "U",
        },
    }
    out = get_content_with_optional_bibtex(sections, doc, "full", True, result=result)
    assert out.startswith(
        "```\n% WARNING: The retrieved citation title may not match the paper title.\n"
        '% Paper title: "T"\n% Citation title: "U"\n% \n@article{x,'
    )


def test_image_metrics_colon_variant_never_matches_pipeline_output():
    md = (
        "![a](x.png)\n\n> **Image description.** pipeline emits lowercase-dot\n"
    )
    m = calculate_image_metrics(md)
    assert m["original_image_count"] == 1
    assert m["described_image_count"] == 0  # quirk: counter wants "Image Description:"
    assert m["has_processed_images"] is False
    m2 = calculate_image_metrics("> **Image Description:** x")
    assert m2["described_image_count"] == 1
