"""Oracle tests: page assembly (FIXTURES.md F-ASSEMBLE, A1-A5)."""

from paper2llm_spark.oracle.assemble import process_markdown


def _ocr(pages, model="mistral-ocr-latest"):
    return {
        "pages": [
            {"index": i, "markdown": md, "images": imgs, "dimensions": {"width": 612, "height": 792, "dpi": 72}}
            for i, md, imgs in pages
        ],
        "model": model,
    }


def test_single_page_no_images():
    r = process_markdown(_ocr([(0, "# Title\n\nBody.", [])]))
    assert r["markdown"] == "#### Page 1\n\n# Title\n\nBody."
    assert r["image_references"] == []
    assert r["page_count"] == 1
    assert r["model"] == "mistral-ocr-latest"


def test_three_pages_separators_before_pages_2_and_3():
    r = process_markdown(_ocr([(0, "one", []), (1, "two", []), (2, "three", [])]))
    assert r["markdown"] == (
        "#### Page 1\n\none"
        "\n\n---\n\n#### Page 2\n\ntwo"
        "\n\n---\n\n#### Page 3\n\nthree"
    )


def test_newline_collapse_is_per_page_before_join():
    # \n{3,} collapsed within a page; the join itself adds nothing
    r = process_markdown(_ocr([(0, "a\n\n\nb\n\n\n\n\nc", [])]))
    assert r["markdown"] == "#### Page 1\n\na\n\nb\n\nc"


def test_heading_uses_index_plus_1_separator_uses_array_position():
    # non-contiguous indexes 0,2,5 -> headings Page 1, Page 3, Page 6
    r = process_markdown(_ocr([(0, "a", []), (2, "b", []), (5, "c", [])]))
    assert r["markdown"] == (
        "#### Page 1\n\na\n\n---\n\n#### Page 3\n\nb\n\n---\n\n#### Page 6\n\nc"
    )


def test_empty_page_still_counts_for_separators():
    r = process_markdown(_ocr([(0, "a", []), (1, "", []), (2, "c", [])]))
    assert r["markdown"] == (
        "#### Page 1\n\na\n\n---\n\n#### Page 2\n\n\n\n---\n\n#### Page 3\n\nc"
    )


def test_image_ref_extraction_order_and_empty_refs_dropped():
    r = process_markdown(
        _ocr([
            (0, "![a](img-0.jpeg) and ![b]()", []),
            (1, "![c](img-1.jpeg)", []),
        ])
    )
    assert r["image_references"] == ["img-0.jpeg", "img-1.jpeg"]


def test_options_off_passthrough():
    r = process_markdown(
        _ocr([(0, "a\n\n\n\nb", []), (1, "c", [])]),
        add_page_numbers=False,
        add_page_separators=False,
        normalize_line_breaks_opt=False,
        extract_image_references=False,
    )
    assert r["markdown"] == "a\n\n\n\nbc"
    assert r["image_references"] == []
