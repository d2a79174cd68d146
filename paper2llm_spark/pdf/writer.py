"""Deterministic mini-PDF writer (fixture generator side).

Replaces the reference's external OCR input (``src/core/ocr-service.ts``
posts PDFs to Mistral ``/v1/ocr``) with a corpus we control end-to-end:
this writer emits *real* PDF 1.4 structure — catalog, page tree, per-page
uncompressed content streams with ``Tm/Tf/Tj`` text operators and
``cm + Do`` image XObjects, plus a correct xref table — so the parser in
``paper2llm_spark.pdf.parser`` does genuine layout work (coordinate
sorting, column detection, font-size → heading mapping) and its output is
reproducible by construction (FIXTURES.md §1).

Page model: a page is a list of elements,

* ``("text", x, y, size, text)`` — baseline origin at (x, y) in PDF
  points (y grows upward), font size in points;
* ``("image", x, y, w, h)``      — placed image; the writer assigns the
  document-wide Mistral-style id ``img-{N}.jpeg`` (observed convention in
  the reference's bundled API doc, paper2llm-web/mistral_ocr_api.md) and
  stores it in the XObject's ``/Name`` so a page-range parse needs no
  cross-page state.

Text bytes are UTF-8 inside PDF string parens with ``\\( \\) \\\\``
escapes (and ``\\n``/``\\r`` kept out via escaping), a deliberate
simplification of font cmaps that keeps the container honest.
"""

from __future__ import annotations

PAGE_WIDTH = 612
PAGE_HEIGHT = 792
PAGE_DPI = 72


def _escape_pdf_string(text: str) -> bytes:
    raw = text.encode("utf-8", errors="surrogatepass")
    out = bytearray()
    for b in raw:
        if b in (0x28, 0x29, 0x5C):  # ( ) \
            out.append(0x5C)
            out.append(b)
        elif b == 0x0A:
            out.extend(b"\\n")
        elif b == 0x0D:
            out.extend(b"\\r")
        else:
            out.append(b)
    return bytes(out)


def _content_stream(elements: list[tuple], image_names: dict[int, str]) -> bytes:
    """Build the page content stream; ``image_names`` maps element index ->
    XObject resource name for image elements."""
    parts: list[bytes] = []
    for idx, el in enumerate(elements):
        kind = el[0]
        if kind == "text":
            _, x, y, size, text = el
            parts.append(
                b"BT /F1 %d Tf 1 0 0 1 %d %d Tm (%s) Tj ET"
                % (size, x, y, _escape_pdf_string(text))
            )
        elif kind == "image":
            _, x, y, w, h = el
            name = image_names[idx]
            parts.append(
                b"q %d 0 0 %d %d %d cm /%s Do Q" % (w, h, x, y, name.encode())
            )
        else:  # pragma: no cover - fixture-side guard
            raise ValueError(f"unknown element kind {kind!r}")
    return b"\n".join(parts) + b"\n"


def write_pdf(pages: list[list[tuple]]) -> bytes:
    """Serialize pages (lists of elements, see module doc) to PDF bytes."""
    objects: list[bytes] = []  # 1-indexed object bodies (without "N 0 obj")

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    catalog_num = add(b"")  # placeholder, filled after pages tree exists
    pages_num = add(b"")
    font_num = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )

    image_counter = 0
    kid_nums: list[int] = []

    for elements in pages:
        # image XObjects for this page
        image_names: dict[int, str] = {}
        xobject_entries: list[bytes] = []
        for idx, el in enumerate(elements):
            if el[0] == "image":
                name = f"Im{image_counter}"
                # /Name records the document-wide Mistral-style id so a
                # page-range parse is self-contained.
                xobj_num = add(
                    b"<< /Type /XObject /Subtype /Image /Width %d /Height %d"
                    b" /ColorSpace /DeviceGray /BitsPerComponent 8"
                    b" /Name /img%d /Length 1 >>\nstream\n\x00\nendstream"
                    % (el[3], el[4], image_counter)
                )
                image_names[idx] = name
                xobject_entries.append(b"/%s %d 0 R" % (name.encode(), xobj_num))
                image_counter += 1

        stream = _content_stream(elements, image_names)
        content_num = add(
            b"<< /Length %d >>\nstream\n%sendstream" % (len(stream), stream)
        )

        resources = b"<< /Font << /F1 %d 0 R >>" % font_num
        if xobject_entries:
            resources += b" /XObject << %s >>" % b" ".join(xobject_entries)
        resources += b" >>"

        page_num = add(
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %d %d]"
            b" /Resources %s /Contents %d 0 R >>"
            % (pages_num, PAGE_WIDTH, PAGE_HEIGHT, resources, content_num)
        )
        kid_nums.append(page_num)

    objects[catalog_num - 1] = b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num
    kids = b" ".join(b"%d 0 R" % n for n in kid_nums)
    objects[pages_num - 1] = (
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(kid_nums))
    )

    # serialize with a correct xref table
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0] * (len(objects) + 1)
    for i, body in enumerate(objects, start=1):
        offsets[i] = len(out)
        out += b"%d 0 obj\n" % i
        out += body
        out += b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for i in range(1, len(objects) + 1):
        out += b"%010d 00000 n \n" % offsets[i]
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, catalog_num, xref_pos)
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# Markdown-spec -> placed elements (fixture authoring convenience)
# ---------------------------------------------------------------------------

# font size <-> heading level contract shared with the parser
HEADING_SIZES = {1: 24, 2: 20, 3: 18, 4: 16, 5: 14, 6: 13}
BODY_SIZE = 11
LINE_LEADING = 14       # within-paragraph leading
PARA_GAP = 28           # block gap => blank line on parse
LEFT_X = 50
RIGHT_X = 320           # second column x (parser splits at COLUMN_SPLIT_X)
TOP_Y = 742
IMAGE_DEFAULT = (200, 120)


def layout_markdown_page(
    markdown: str, *, column: str = "single", x: int | None = None
) -> list[tuple]:
    """Place a page's markdown-ish lines as PDF elements.

    Flow model (the writer<->parser layout contract): every line occupies
    one slot at a descending *anchor* y — the text baseline, or the image
    TOP (the parser recovers an image's anchor as ``y + h``). Consecutive
    lines step :data:`LINE_LEADING`; a blank source line widens the step
    to :data:`PARA_GAP`, which the parser maps back to a blank line.

    ``#``-prefixed lines (1-6 hashes + space) become heading font sizes
    per :data:`HEADING_SIZES`; an ``![``-prefixed line becomes an image
    element (id assigned document-wide by the writer); everything else is
    body text, verbatim. ``column`` picks left/right x for two-column
    fixtures.
    """
    if x is None:
        x = LEFT_X if column in ("single", "left") else RIGHT_X
    elements: list[tuple] = []
    anchor = TOP_Y
    pending_gap = False
    for line in markdown.split("\n"):
        if line.strip() == "":
            pending_gap = True
            continue
        if pending_gap and elements:
            anchor -= PARA_GAP - LINE_LEADING
        pending_gap = False
        if line.startswith("!["):
            w, h = IMAGE_DEFAULT
            elements.append(("image", x, anchor - h, w, h))  # top at anchor
        else:
            stripped = line.lstrip("#")
            n_hashes = len(line) - len(stripped)
            if 1 <= n_hashes <= 6 and stripped.startswith(" "):
                size = HEADING_SIZES[n_hashes]
                text = stripped[1:]
            else:
                size = BODY_SIZE
                text = line
            elements.append(("text", x, anchor, size, text))
        anchor -= LINE_LEADING
    return elements


def two_column_page(left_markdown: str, right_markdown: str) -> list[tuple]:
    """A two-column page: parser must emit left column then right column."""
    return layout_markdown_page(left_markdown, column="left") + layout_markdown_page(
        right_markdown, column="right"
    )
