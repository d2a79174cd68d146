"""Oracle tests: image enhancement (FIXTURES.md F-IMAGES, I1-I8)."""

from paper2llm_spark.oracle.enhance import (
    PLACEHOLDER,
    build_image_context_map,
    enhance_image_references,
    ensure_image_description_spacing,
    extract_image_context,
)


def test_placeholder_replacement_with_spacing():
    md = "text before\n![img-0.jpeg](img-0.jpeg)\ntext after"
    out = enhance_image_references(md, {}, replace_images_with_placeholder=True)
    # blank line enforced BEFORE the block; the placeholder's own trailing
    # "\n" yields an empty line that the exit branch CONSUMES (pushes
    # nothing when the exit line is "", markdown-processor.ts:132-146)
    assert out == "text before\n\n> **Image.** [not displayed]\ntext after"


def test_placeholder_blank_line_added_after_when_next_line_nonempty():
    # exit on a NON-empty line -> a blank line is inserted before it
    md = "before\n\n> **Image.** [not displayed]\nnext line"
    from paper2llm_spark.oracle.enhance import ensure_image_description_spacing
    out = ensure_image_description_spacing(md)
    assert out == "before\n\n> **Image.** [not displayed]\n\nnext line"


def test_figure_caption_gets_blank_lines():
    md = "before\n![img-0.jpeg](img-0.jpeg)\nFigure 1: caption\nafter"
    out = enhance_image_references(md, {}, replace_images_with_placeholder=True)
    assert out == (
        "before\n\n> **Image.** [not displayed]\n\nFigure 1: caption\n\nafter"
    )


def test_extended_regex_alt_and_title():
    md = '![alt text](img-1.jpeg "a title")'
    out = enhance_image_references(md, {}, replace_images_with_placeholder=True)
    assert "img-1.jpeg" not in out
    assert PLACEHOLDER.rstrip("\n") in out


def test_id_normalization_path_and_query():
    md = "![x](figures/img-2.jpeg?w=3)"
    descs = {"img-2.jpeg": "A nice figure."}
    out = enhance_image_references(md, descs)
    assert "> **Image description.** A nice figure." in out


def test_two_identical_refs_first_occurrence_semantics():
    md = "![a](img-0.jpeg)\nmiddle\n![a](img-0.jpeg)"
    out = enhance_image_references(md, {}, replace_images_with_placeholder=True)
    # both matches collected; each replace hits the first remaining occurrence
    assert out.count("> **Image.** [not displayed]") == 2
    assert "![a](img-0.jpeg)" not in out


def test_multiline_description_blockquote_format():
    md = "![x](img-3.jpeg)"
    descs = {"img-3.jpeg": "  line one\nline two\nline three  "}
    out = enhance_image_references(md, descs)
    assert (
        "> **Image description.** line one\n> line two\n> line three" in out
    )


def test_fuzzy_match_case_insensitive_bidirectional_substring():
    md = "![x](IMG-4.JPEG)"
    descs = {"img-4.jpeg": "found via fuzzy"}
    out = enhance_image_references(md, descs)
    assert "found via fuzzy" in out

    # reverse containment: key is substring of id
    md2 = "![x](prefix-img-5.jpeg)"
    descs2 = {"img-5.jpeg": "reverse fuzzy"}
    out2 = enhance_image_references(md2, descs2)
    assert "reverse fuzzy" in out2


def test_doc_ending_in_image_block_gets_trailing_blank_line():
    # EOF while still inside a ">"-block appends one empty line (:179-181);
    # the placeholder's own trailing "\n" is consumed by the exit branch,
    # so drive the state machine directly with a block at EOF.
    md = "text\n\n> **Image.** [not displayed]"
    out = ensure_image_description_spacing(md)
    assert out == "text\n\n> **Image.** [not displayed]\n"
    # and via the full enhance path, trailing "\n" case: the empty final
    # line is consumed on exit
    out2 = enhance_image_references(
        "text\n![x](img-0.jpeg)", {}, replace_images_with_placeholder=True
    )
    assert out2 == "text\n\n> **Image.** [not displayed]"


def test_no_descriptions_no_placeholder_returns_original():
    md = "![x](img-0.jpeg)"
    assert enhance_image_references(md, {}) == md


def test_keep_original_images():
    md = "![x](img-9.jpeg)"
    out = enhance_image_references(md, {"img-9.jpeg": "desc"}, keep_original_images=True)
    assert "![x](img-9.jpeg)" in out
    assert "> **Image description.** desc" in out


def test_dollar_patterns_in_description_are_js_expanded():
    # JS String.replace expands $& even for string searches — a description
    # containing $& duplicates the matched image ref
    md = "![x](img-0.jpeg)"
    out = enhance_image_references(md, {"img-0.jpeg": "price $$100 and $&"})
    assert "$100" in out
    assert "![x](img-0.jpeg)" in out  # $& expanded to the match


def test_spacing_consumes_existing_blank_line_after_block():
    # quirk: the exit branch pushes nothing for an empty exit line, so an
    # existing blank line after a block is CONSUMED (not idempotent)
    md = "before\n\n> **Image.** [not displayed]\n\nafter"
    assert (
        ensure_image_description_spacing(md)
        == "before\n\n> **Image.** [not displayed]\nafter"
    )


def test_context_page_label_is_literal_img_prefix():
    ctx = extract_image_context("page content", "img-0.jpeg")
    assert ctx == (
        "This image appears on page img. The surrounding page content follows."
        "\n\npage content"
    )


def test_context_truncation_at_1997_plus_ellipsis():
    long_page = "x" * 2500
    ctx = extract_image_context(long_page, "img-1.jpeg")
    body = ctx.split("\n\n", 1)[1]
    assert body == "x" * 1997 + "..."
    # exactly 2000 chars is NOT truncated (strict >)
    ctx2 = extract_image_context("y" * 2000, "img-1.jpeg")
    assert ctx2.endswith("y" * 2000)


def test_context_map_insertion_order():
    pages = [
        {"index": 0, "markdown": "p0", "images": [{"id": "img-0.jpeg"}, {"id": "img-1.jpeg"}]},
        {"index": 1, "markdown": "p1", "images": [{"id": "img-2.jpeg"}]},
    ]
    cmap = build_image_context_map(pages)
    assert list(cmap) == ["img-0.jpeg", "img-1.jpeg", "img-2.jpeg"]
    assert cmap["img-2.jpeg"].endswith("p1")
