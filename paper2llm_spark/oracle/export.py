"""Section export assembly — oracle for ``content-utils.ts``.

Transliterates ``src/web/components/markdown-preview/utils/content-utils.ts``
(reference repo lacerbi/paper2llm): section selection/concatenation
(:17-87), the BibTeX-prepend path (:100-199) and image metrics (:230-252).

Reproduced quirks:

* ``allparts`` orders main, appendix, backmatter (appendix FIRST, :49-64)
  joined with ``"\\n\\n"``;
* the fallback mock citation embeds a generation date — pinned via
  ``now_date`` for determinism (:161,:166);
* ``calculateImageMetrics`` counts ``> **Image Description:**`` (colon)
  which the pipeline never emits (it writes ``**Image description.**``,
  markdown-processor.ts:298), so ``described_image_count`` is 0 for
  pipeline output (:237).
"""

from __future__ import annotations

import re
from typing import Any

from .bibtex import PINNED_YEAR, generate_bibtex_from_markdown

PINNED_DATE = "2026-01-01"  # new Date().toISOString().split('T')[0], pinned

_IMG_COUNT_RE = re.compile(r"!\[.*?\]\(.*?\)", re.A)  # :232
_DESC_COUNT_RE = re.compile(r"> \*\*Image Description:\*\*", re.A)  # :237


def get_section_content(
    sections: dict[str, Any] | None,
    markdown: str,
    section: str,
    add_title: bool = False,
) -> str | None:
    """``getSectionContent`` (content-utils.ts:17-87)."""
    if sections is None:
        return None

    if section == "full":
        content: str | None = markdown
    elif section == "main":
        content = sections["main_content"]
    elif section == "appendix":
        content = sections["appendix"]
    elif section == "backmatter":
        content = sections["backmatter"]
    elif section == "allparts":
        parts: list[str] = []
        if sections["main_content"]:
            parts.append(sections["main_content"])
        if sections["appendix"]:
            title = sections["title"]
            parts.append(
                f"# {title} - Appendix\n\n---\n\n{sections['appendix']}"
                if add_title
                else sections["appendix"]
            )
        if sections["backmatter"]:
            title = sections["title"]
            parts.append(
                f"# {title} - Backmatter\n\n---\n\n{sections['backmatter']}"
                if add_title
                else sections["backmatter"]
            )
        content = "\n\n".join(parts)
    else:
        return None

    if not content:
        return None

    if add_title and section in ("appendix", "backmatter"):
        title = sections["title"]
        section_title = section[0].upper() + section[1:]
        content = f"# {title} - {section_title}\n\n---\n\n" + content

    return content


def get_content_with_optional_bibtex(
    sections: dict[str, Any] | None,
    markdown: str,
    section: str,
    include_bibtex: bool,
    add_title: bool = False,
    result: dict[str, Any] | None = None,
    *,
    now_year: int = PINNED_YEAR,
    now_date: str = PINNED_DATE,
) -> str | None:
    """``getContentWithOptionalBibtex`` (content-utils.ts:100-199),
    deterministic branches: pre-generated BibTeX passthrough with
    title-mismatch warning (:122-135), on-demand regeneration via the
    mock path (:137-176 — always lands in the empty-string fallback
    :148-168 because the pipeline's generator is the mock), and the
    fenced prepend (:195)."""
    content = get_section_content(sections, markdown, section, add_title)
    if not content:
        return None
    if not include_bibtex:
        return content
    if section not in ("full", "main", "allparts"):
        return content

    if result and result.get("bibtex") not in (None, ""):
        bibtex = result["bibtex"]
        validation = result.get("bibtex_title_validation")
        if (
            validation
            and not validation["matches"]
            and "WARNING: The retrieved citation title may not match" not in bibtex
        ):
            bibtex = (
                "% WARNING: The retrieved citation title may not match the paper title.\n"
                f"% Paper title: \"{validation['original_title']}\"\n"
                f"% Citation title: \"{validation['bibtex_title']}\"\n"
                "% \n"
                f"{bibtex}"
            )
    else:
        generation = generate_bibtex_from_markdown(content, now_year=now_year)
        bibtex = generation["bibtex"]
        validation = generation["title_validation"]
        if result is not None and validation:
            result["bibtex_title_validation"] = validation
        if not bibtex or bibtex.strip() == "":
            title_warning = (
                (
                    "% WARNING: The paper title does not match the citation title.\n"
                    f"% Paper title: \"{validation['original_title']}\"\n"
                    f"% Citation title: \"{validation['bibtex_title']}\"\n"
                    "% "
                )
                if validation and not validation["matches"]
                else ""
            )
            title = sections["title"] if sections else "Unknown Title"
            bibtex = (
                "% WARNING: This is a fallback mock citation.\n"
                f"{title_warning}% BibTeX generation failed to find this paper in academic databases.\n"
                "% Please replace with the correct citation if available.\n"
                "% \n"
                f"% Generated: {now_date}\n"
                "@article{unknownYear,\n"
                f"  title={{{title or 'Unknown Title'}}},\n"
                "  author={Unknown Author},\n"
                "  journal={Unknown Journal},\n"
                f"  year={{{now_year}}},\n"
                "  note={This is an automatically generated fallback citation}\n"
                "}"
            )
        elif validation and not validation["matches"]:
            bibtex = (
                "% WARNING: The retrieved citation title may not match the paper title.\n"
                f"% Paper title: \"{validation['original_title']}\"\n"
                f"% Citation title: \"{validation['bibtex_title']}\"\n"
                "% \n"
                f"{bibtex}"
            )

    return f"```\n{bibtex}\n```\n\n---\n\n{content}"


def calculate_image_metrics(markdown: str) -> dict[str, Any]:
    """``calculateImageMetrics`` (content-utils.ts:230-252)."""
    markdown_image_count = len(_IMG_COUNT_RE.findall(markdown))
    described_image_count = len(_DESC_COUNT_RE.findall(markdown))
    original_image_count = max(markdown_image_count, described_image_count)
    return {
        "original_image_count": original_image_count,
        "described_image_count": described_image_count,
        "has_processed_images": described_image_count > 0,
    }
