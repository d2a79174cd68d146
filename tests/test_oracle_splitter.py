"""Oracle tests: section splitting (FIXTURES.md F-SPLIT S1-S12, F-HEADINGS)."""

from paper2llm_spark.oracle.splitter import (
    count_words,
    extract_title,
    find_section_boundaries,
    get_markdown_sections_metadata,
    prepare_formatted_sections,
    split_markdown_content,
)


def test_title_from_h1():
    assert extract_title("intro\n# The Real Title \nbody") == "The Real Title"


def test_title_fallback_bibtex_then_placeholder():
    assert extract_title("no heading but title={From BibTeX} here") == "From BibTeX"
    assert extract_title("nothing at all") == "Untitled_Paper"


def test_ack_only_backmatter():
    doc = "# T\n\nbody\n\n## Acknowledgments\n\nthanks"
    r = split_markdown_content(doc)
    assert r["backmatter"] == "## Acknowledgments\n\nthanks"
    assert r["appendix"] is None
    assert r["main_content"] == "# T\n\nbody"


def test_references_is_backmatter():
    doc = "# T\n\nbody\n\n## References\n\n[1] x"
    r = split_markdown_content(doc)
    assert r["backmatter"] == "## References\n\n[1] x"


def test_appendix_only():
    doc = "# T\n\nbody\n\n## Appendix A\n\nextra"
    r = split_markdown_content(doc)
    assert r["appendix"] == "## Appendix A\n\nextra"
    assert r["backmatter"] is None


def test_both_ack_and_appendix_in_order():
    doc = "# T\n\nbody\n\n## References\n\n[1] x\n\n## Appendix\n\nextra"
    r = split_markdown_content(doc)
    assert r["main_content"] == "# T\n\nbody"
    assert r["backmatter"] == "## References\n\n[1] x"
    assert r["appendix"] == "## Appendix\n\nextra"


def test_bare_A_heading_before_ack_not_appendix():
    doc = "# T\n\n## A Proofs\n\nstuff\n\n## References\n\n[1]"
    r = split_markdown_content(doc)
    assert r["appendix"] is None
    assert r["backmatter"].startswith("## References")


def test_bare_A_heading_after_ack_is_appendix():
    doc = "# T\n\nbody\n\n## References\n\n[1]\n\n## A Proofs\n\nstuff"
    r = split_markdown_content(doc)
    assert r["appendix"] == "## A Proofs\n\nstuff"


def test_bare_A_heading_without_any_ack_is_accepted():
    # guard only applies when an ack boundary exists (markdown-splitter.ts:148)
    doc = "# T\n\nbody\n\n## A Proofs\n\nstuff"
    r = split_markdown_content(doc)
    assert r["appendix"] == "## A Proofs\n\nstuff"


def test_page_marker_pull_in_blank_between():
    doc = "# T\n\nbody\n\n#### Page 12\n\n\n## References\n\n[1]"
    ack, app = find_section_boundaries(doc)
    assert doc[ack:].startswith("#### Page 12")


def test_page_marker_no_pull_in_when_content_between():
    doc = "# T\n\nbody\n\n#### Page 12\n\nsome text\n## References\n\n[1]"
    ack, app = find_section_boundaries(doc)
    assert doc[ack:].startswith("## References")


def test_page_marker_only_last_5_lines():
    filler = "\n".join([""] * 6)
    doc = f"# T\n\n#### Page 9{filler}\n## References\n\n[1]"
    ack, app = find_section_boundaries(doc)
    # marker more than 5 lines back -> not pulled in
    assert doc[ack:].startswith("## References")


def test_ack_inside_appendix_re_searched():
    doc = (
        "# T\n\nbody\n\n## Funding\n\nmoney\n\n## Appendix\n\nextra\n\n"
        "## Acknowledgments\n\nthanks inside appendix"
    )
    r = split_markdown_content(doc)
    # earliest-ack (Acknowledgments pattern is checked first but Funding is
    # earlier by index) -> Funding is backmatter; ack in appendix stays there
    assert r["backmatter"].startswith("## Funding")
    assert "thanks inside appendix" in r["appendix"]


def test_ack_after_appendix_only_re_search_first_pattern_order():
    # Only ack heading is INSIDE the appendix; re-search inside [0, appendix)
    # finds References (pattern order, not index order)
    doc = (
        "# T\n\nbody\n\n## References\n\n[1]\n\n## Appendix\n\nextra\n\n"
        "## Acknowledgments\n\nthanks"
    )
    r = split_markdown_content(doc)
    assert r["backmatter"].startswith("## References")
    assert "## Acknowledgments" in r["appendix"]


def test_trailing_hr_stripped_and_trimmed():
    doc = "# T\n\nbody\n\n---\n\n## References\n\n[1]\n\n---\n  "
    r = split_markdown_content(doc)
    assert r["main_content"] == "# T\n\nbody"
    assert r["backmatter"] == "## References\n\n[1]"


def test_supplementary_variants():
    for heading in ["## S1. Supplementary Tables", "## Supplementary Material",
                    "## Supporting Information", "## Supplemental Analyses"]:
        doc = f"# T\n\nbody\n\n{heading}\n\nx"
        r = split_markdown_content(doc)
        assert r["appendix"] is not None, heading


def test_word_count_whitespace_split():
    assert count_words("  a\tb\nc  d ") == 4
    assert count_words("") == 0
    assert count_words(None) == 0


def test_metadata_counts():
    doc = "# T\n\none two three\n\n## References\n\nfour five"
    m = get_markdown_sections_metadata(doc)
    assert m["word_count"]["main_content"] == 5  # "# T one two three"
    assert m["word_count"]["backmatter"] == 4    # "## References four five"
    assert m["word_count"]["total"] == 9
    assert m["has_backmatter"] and not m["has_appendix"]


def test_prepare_formatted_sections():
    doc = "# Old\n\nbody\n\n## Appendix\n\nxx\n\n"
    sections = split_markdown_content(doc)
    # force a different title to observe the replacement
    sections["title"] = "New Title"
    out = prepare_formatted_sections(sections)
    assert out["main_content"].startswith("# New Title\n")
    assert out["appendix"] == "# New Title - Appendix\n\n---\n\n## Appendix\n\nxx"


def test_case_insensitive_headings():
    doc = "# T\n\nbody\n\n## REFERENCES\n\n[1]"
    r = split_markdown_content(doc)
    assert r["backmatter"].startswith("## REFERENCES")


def test_boundary_search_equals_naive_pattern_search():
    """The candidate-anchored boundary search (splitter._first_match_at
    over heading positions) must equal plain Pattern.search for every
    pattern on randomized heading soups — the equivalence that makes the
    22x-scan optimization byte-safe."""
    import random

    from paper2llm_spark.oracle.splitter import (
        ACK_PATTERNS,
        APPENDIX_PATTERNS,
        _HEADING_RE,
        _first_match_at,
    )

    rng = random.Random(7)
    frags = [
        "# Title", "## References", "###  Appendix B", "#Funding",
        "## A ", "## A. x", "text line", "", "  # not heading",
        "#### Page 3", "## Acknowledgments", "## SI ", "## S2. y",
        "## Supplementary Material", "## Works Cited", "body body",
        "## REFERENCES", "##\tBroader Impact", "# A", "## Citations",
    ]
    for _ in range(300):
        doc = "\n".join(rng.choice(frags) for _ in range(rng.randint(0, 40)))
        heads = [m.start() for m in _HEADING_RE.finditer(doc)]
        for pattern in ACK_PATTERNS + APPENDIX_PATTERNS:
            naive = pattern.search(doc)
            fast = _first_match_at(pattern, doc, heads)
            assert (naive is None) == (fast is None)
            if naive is not None:
                assert naive.start() == fast.start()
                assert naive.group(0) == fast.group(0)
