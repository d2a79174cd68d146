"""Image-reference enhancement — oracle for ``enhanceImageReferences``.

Transliterates ``src/core/markdown-processor.ts:94-408`` (reference repo
lacerbi/paper2llm): the spacing state machine
(``ensureImageDescriptionSpacing``, :94-185), the description/placeholder
splice (``enhanceImageReferences``, :187-352) and the per-image context
build (``buildImageContextMap`` / ``extractImageContext``, :360-408).

Reproduced quirks:

* matches are collected from the ORIGINAL markdown, then spliced
  sequentially into the evolving string with **first-occurrence** JS
  ``String.replace`` semantics incl. ``$``-pattern expansion (:226,:325,:338);
* fuzzy id lookup is case-insensitive bidirectional substring, first hit
  in Map insertion order (:261-277);
* placeholder text is exactly ``"> **Image.** [not displayed]\\n"`` (:329);
* context page label is ``image.id.split("-")[0]`` — for Mistral-style ids
  ``img-0.jpeg`` that is the literal string ``img`` (:395);
* context truncation is 2000 UTF-16 units, cut at 1997 + ``"..."``
  (:400-404).
"""

from __future__ import annotations

import re
from typing import Any

from .jsstr import JS_WS_CLASS, js_replace_first, js_trim, utf16_len, utf16_substring

# /!\[(.*?)\](?:\{.*?\})?\((.*?)(?:\s+["\']*?["\'])?\)/g  (:221)
_IMG_EXT_RE = re.compile(
    r"!\[(.*?)\](?:\{.*?\})?\((.*?)(?:["
    + JS_WS_CLASS
    + r"]+[\"\'].*?[\"\'])?\)",
    re.A,
)

# /^> \*\*(?:Image description|Image Description|Image)\.\*\*/  (:112)
_IMG_BLOCK_START_RE = re.compile(
    r"^> \*\*(?:Image description|Image Description|Image)\.\*\*", re.A
)

PLACEHOLDER = "> **Image.** [not displayed]\n"  # :329


def ensure_image_description_spacing(markdown: str) -> str:
    """``ensureImageDescriptionSpacing`` (markdown-processor.ts:94-185)."""
    if not markdown:
        return markdown

    lines = markdown.split("\n")
    result: list[str] = []
    in_image_block = False
    after_image_block = False
    i = 0

    while i < len(lines):
        line = lines[i]

        if not in_image_block and _IMG_BLOCK_START_RE.match(line):
            in_image_block = True
            after_image_block = False
            if i > 0 and len(result) > 0 and result[-1] != "":
                result.append("")
            result.append(line)
        elif in_image_block and line.startswith(">"):
            result.append(line)
        elif in_image_block:
            in_image_block = False
            after_image_block = True
            if line != "":
                result.append("")
            if line != "":
                result.append(line)
        elif after_image_block and line.startswith("Figure "):
            # /^Figure /  (:148)
            if len(result) > 0 and result[-1] != "":
                result.append("")
            result.append(line)
            if i < len(lines) - 1 and lines[i + 1] != "":
                result.append("")
        else:
            result.append(line)
            if line != "" and not line.startswith("Figure "):
                after_image_block = False

        i += 1

    if in_image_block:
        result.append("")

    return "\n".join(result)


def _collect_matches(markdown: str) -> list[dict[str, str]]:
    """Extended image-ref matches (:221-234); ``match[2]`` must be truthy."""
    out = []
    for m in _IMG_EXT_RE.finditer(markdown):
        if m.group(2):
            out.append({"full": m.group(0), "alt": m.group(1) or "", "src": m.group(2)})
    return out


def enhance_image_references(
    markdown: str,
    image_descriptions: dict[str, str],
    *,
    keep_original_images: bool = False,
    replace_images_with_placeholder: bool = False,
) -> str:
    """``enhanceImageReferences`` (markdown-processor.ts:187-352)."""
    if (not image_descriptions) and not replace_images_with_placeholder:
        return markdown

    enhanced = markdown
    matches = _collect_matches(markdown)

    for match in matches:
        image_id = match["src"]
        # Strip path prefixes: split("/").pop() || imageId  (:252)
        last = image_id.split("/")[-1]
        image_id = last if last else image_id
        # Remove query params  (:255)
        image_id = image_id.split("?")[0]

        description = image_descriptions.get(image_id)

        # JS `if (!description)` — falsy check: empty string also re-tries
        # the fuzzy lookup, and an empty fuzzy result falls through to the
        # placeholder branch (:261,:287).
        if not description and image_descriptions:
            lowered = image_id.lower()
            potential = [
                key
                for key in image_descriptions
                if lowered in key.lower() or key.lower() in lowered
            ]
            if potential:
                description = image_descriptions.get(potential[0])

        if description:
            trimmed = js_trim(description)
            desc_lines = trimmed.split("\n")
            formatted_lines = [
                (f"> **Image description.** {line}" if idx == 0 else f"> {line}")
                for idx, line in enumerate(desc_lines)
            ]
            formatted = "\n".join(formatted_lines)
            if keep_original_images:
                replacement = f"{match['full']}\n\n{formatted}\n"
            else:
                replacement = f"{formatted}\n"
            enhanced = js_replace_first(enhanced, match["full"], replacement)
        elif replace_images_with_placeholder:
            enhanced = js_replace_first(enhanced, match["full"], PLACEHOLDER)

    return ensure_image_description_spacing(enhanced)


def extract_image_context(page_content: str, image_id: str) -> str:
    """``extractImageContext`` (markdown-processor.ts:390-408)."""
    first = image_id.split("-")[0]
    page_number = first if first else "unknown"
    context_summary = (
        f"This image appears on page {page_number}. "
        "The surrounding page content follows."
    )
    page_text = page_content
    if utf16_len(page_text) > 2000:
        page_text = utf16_substring(page_text, 0, 1997) + "..."
    return f"{context_summary}\n\n{page_text}"


def build_image_context_map(pages: list[dict[str, Any]]) -> dict[str, str]:
    """``buildImageContextMap`` (markdown-processor.ts:360-378).

    Insertion order = page order then image order, matching the JS Map.
    """
    context_map: dict[str, str] = {}
    for page in pages:
        for image in page["images"]:
            context_map[image["id"]] = extract_image_context(
                page["markdown"], image["id"]
            )
    return context_map
