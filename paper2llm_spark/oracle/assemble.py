"""Page assembly — oracle for the reference's ``processMarkdown``.

Transliterates ``src/core/markdown-processor.ts:17-77`` (reference repo
lacerbi/paper2llm at /root/reference/paper2llm-web/): per-page image-ref
extraction, ``"\\n\\n---\\n\\n"`` separator before every page except the
first, ``#### Page {index+1}\\n\\n`` heading, per-page collapse of
``\\n{3,}`` to ``\\n\\n``, then ``join("")``.

Pages are iterated in *array order*; the heading number comes from the
page's own ``index`` field (markdown-processor.ts:50), while separator
placement comes from array position (``markdownParts.length > 0``,
markdown-processor.ts:44). Both semantics must survive page-range
splitting + reassembly in the Spark pipeline.
"""

from __future__ import annotations

import re
from typing import Any

# /!\[.*?\]\((.*?)\)/g  (markdown-processor.ts:34)
_IMG_REF_RE = re.compile(r"!\[.*?\]\((.*?)\)", re.A)
# /\n{3,}/g  (markdown-processor.ts:55)
_MULTI_NL_RE = re.compile(r"\n{3,}", re.A)


def extract_image_refs(page_markdown: str) -> list[str]:
    """Image-ref srcs on one page; empty captures dropped
    (``if (match[1])``, markdown-processor.ts:37-39)."""
    return [m for m in _IMG_REF_RE.findall(page_markdown) if m]


def normalize_line_breaks(page_markdown: str) -> str:
    """Collapse ``\\n{3,}`` to ``\\n\\n`` (markdown-processor.ts:54-56)."""
    return _MULTI_NL_RE.sub("\n\n", page_markdown)


def process_markdown(
    ocr_result: dict[str, Any],
    *,
    add_page_numbers: bool = True,
    add_page_separators: bool = True,
    normalize_line_breaks_opt: bool = True,
    extract_image_references: bool = True,
) -> dict[str, Any]:
    """``MarkdownProcessor.processMarkdown`` (markdown-processor.ts:17-77).

    ``ocr_result`` is {"pages": [{"index", "markdown", "images", ...}],
    "model": str}. Defaults mirror the web app's only configuration
    (App.tsx:275-280).
    """
    parts: list[str] = []
    image_references: list[str] = []

    for page in ocr_result["pages"]:
        page_content = page["markdown"]

        if extract_image_references:
            image_references.extend(extract_image_refs(page_content))

        if add_page_separators and len(parts) > 0:
            parts.append("\n\n---\n\n")

        if add_page_numbers:
            parts.append(f"#### Page {page['index'] + 1}\n\n")

        if normalize_line_breaks_opt:
            page_content = normalize_line_breaks(page_content)

        parts.append(page_content)

    return {
        "markdown": "".join(parts),
        "image_references": image_references,
        "page_count": len(ocr_result["pages"]),
        "model": ocr_result["model"],
    }
