"""BibTeX generation — oracle for ``bibtex-generator.ts``.

Transliterates ``src/core/utils/bibtex-generator.ts`` (reference repo
lacerbi/paper2llm): year extraction (:108-119), text sanitization
(:127-143), key generation (:153-188), entry formatting (:196-258), title
normalization/comparison (:269-325), the mock entry (:334-369) and the
API-disabled generation path (:468-558).

Reproduced quirks:

* ``sanitizeBibTeXText``'s char class includes JS ``\\s``; a plain space
  maps to itself but ``\\n``/``\\t``/NBSP get backslash-escaped (:133-136);
* smart quotes map to ```` `` ````/``''``, em/en dashes to ``---``/``--``;
* the mock path formats a full entry but the returned ``bibtex`` string is
  ``""`` because ``usedMockEntry`` (:534); the validation struct is still
  populated with ``matches: false`` (:519-525);
* ``compareTitles`` counts duplicate words on the original side but de-dups
  the bibtex side (:302-312);
* "current year" fallbacks (:110,:184,:338) are pinned via ``now_year`` so
  the pipeline is deterministic (tests pin 2026 per FIXTURES.md).
"""

from __future__ import annotations

import re
from typing import Any

from .jsstr import JS_WS, JS_WS_CLASS, js_trim

PINNED_YEAR = 2026  # FIXTURES.md: "current year" constants pinned to 2026

# /[&%$#_{}~^\\\s]/g  (:133)
_SANITIZE_RE = re.compile(r"[&%$#_{}~^\\" + JS_WS_CLASS + r"]", re.A)
# Smart quotes / dashes (:138-141). Spelled via \uXXXX for robustness:
# U+201C/U+201D -> ``, U+2018/U+2019 -> '', U+2014 -> ---, U+2013 -> --.
_DQUOTE_RE = re.compile("[\u201c\u201d]")
_SQUOTE_RE = re.compile("[\u2018\u2019]")

_SKIP_WORDS = ["a", "an", "the", "on", "in", "of", "for", "and", "or"]  # :168
_NON_ALNUM_RE = re.compile(r"[^a-z0-9]", re.A)  # :172

_NON_LETTER_RE = re.compile(r"[^a-z" + JS_WS_CLASS + r"]", re.A)  # :274
_WS_RUN_RE = re.compile("[" + JS_WS_CLASS + "]+", re.A)  # :275


def extract_year_from_date(date_str: str | None, now_year: int = PINNED_YEAR) -> str:
    """``extractYearFromDate`` (:108-119); ISO ``YYYY-...`` strings only —
    the pipeline always passes either None or an ISO timestamp."""
    if not date_str:
        return str(now_year)
    m = re.match(r"([0-9]{4})", date_str)
    return m.group(1) if m else str(now_year)


def sanitize_bibtex_text(text: str) -> str:
    """``sanitizeBibTeXText`` (:127-143)."""
    if not text:
        return ""

    def _esc(m: re.Match) -> str:
        ch = m.group(0)
        if ch == " ":
            return " "
        return "\\" + ch

    out = _SANITIZE_RE.sub(_esc, text)
    out = _DQUOTE_RE.sub("``", out)
    out = _SQUOTE_RE.sub("''", out)
    out = out.replace("\u2014", "---").replace("\u2013", "--")
    return out


def generate_bibtex_key(
    title: str, authors: list[str], year: str | None = None, now_year: int = PINNED_YEAR
) -> str:
    """``generateBibTeXKey`` (:153-188)."""
    author_part = "Unknown"
    if authors:
        author_words = authors[0].split(" ")  # JS split(" ") keeps empties
        author_part = author_words[-1].lower()

    title_words = title.split(" ")
    title_part = ""
    for word in title_words:
        clean = _NON_ALNUM_RE.sub("", word.lower())
        if len(clean) > 2 and clean not in _SKIP_WORDS:
            title_part = clean
            break
    if not title_part and len(title_words) > 0:
        title_part = _NON_ALNUM_RE.sub("", title_words[0].lower())

    year_part = year if year else str(now_year)
    return f"{author_part}{year_part}{title_part}"


_FIXED_FIELDS = [
    "key", "type", "title", "authors", "year", "journal", "booktitle",
    "volume", "issue", "pages", "publisher", "doi", "url", "abstract",
    "titleValidation",
]


def format_bibtex_entry(entry: dict[str, Any]) -> str:
    """``formatBibTeXEntry`` (:196-258)."""
    bibtex = f"@{entry['type']}{{{entry['key']},\n"
    bibtex += f"  title={{{sanitize_bibtex_text(entry['title'])}}},\n"

    authors = entry.get("authors")
    if authors:
        author_str = " and ".join(sanitize_bibtex_text(a) for a in authors)
        bibtex += f"  author={{{author_str}}},\n"
    else:
        bibtex += "  author={Unknown},\n"

    if entry.get("year"):
        bibtex += f"  year={{{entry['year']}}},\n"
    if entry.get("journal"):
        bibtex += f"  journal={{{sanitize_bibtex_text(entry['journal'])}}},\n"
    if entry.get("booktitle"):
        bibtex += f"  booktitle={{{sanitize_bibtex_text(entry['booktitle'])}}},\n"
    if entry.get("volume"):
        bibtex += f"  volume={{{entry['volume']}}},\n"
    if entry.get("issue"):
        bibtex += f"  number={{{entry['issue']}}},\n"
    if entry.get("pages"):
        bibtex += f"  pages={{{entry['pages']}}},\n"
    if entry.get("publisher"):
        bibtex += f"  publisher={{{sanitize_bibtex_text(entry['publisher'])}}},\n"
    if entry.get("doi"):
        bibtex += f"  doi={{{entry['doi']}}},\n"
    if entry.get("url"):
        bibtex += f"  url={{{entry['url']}}},\n"
    if entry.get("abstract"):
        bibtex += f"  abstract={{{sanitize_bibtex_text(entry['abstract'])}}},\n"

    for key, value in entry.items():
        if key not in _FIXED_FIELDS and value is not None:
            formatted = sanitize_bibtex_text(value) if isinstance(value, str) else value
            bibtex += f"  {key}={{{formatted}}},\n"

    return bibtex[:-2] + "\n}"


def normalize_title_for_comparison(title: str) -> str:
    """``normalizeTitleForComparison`` (:269-279)."""
    if not title:
        return ""
    normalized = _NON_LETTER_RE.sub("", title.lower())
    normalized = _WS_RUN_RE.sub(" ", normalized)
    return js_trim(normalized)


def compare_titles(original_title: str, bibtex_title: str) -> dict[str, Any]:
    """``compareTitles`` (:288-325)."""
    normalized_original = normalize_title_for_comparison(original_title)
    normalized_bibtex = normalize_title_for_comparison(bibtex_title)

    if len(normalized_original) < 10 or len(normalized_bibtex) < 10:
        matches = normalized_original == normalized_bibtex
    else:
        original_words = normalized_original.split(" ")
        bibtex_words = set(normalized_bibtex.split(" "))
        common = sum(1 for w in original_words if w in bibtex_words)
        similarity = common / max(len(original_words), len(bibtex_words))
        matches = similarity > 0.75

    return {
        "matches": matches,
        "original_title": original_title,
        "bibtex_title": bibtex_title,
        "normalized_original": normalized_original,
        "normalized_bibtex": normalized_bibtex,
    }


def generate_mock_bibtex_entry(
    title: str, entry_type: str = "article", now_year: int = PINNED_YEAR
) -> dict[str, Any]:
    """``generateMockBibTeXEntry`` (:334-369)."""
    current_year = str(now_year)
    authors = ["Author, Example"]
    key = generate_bibtex_key(title, authors, current_year, now_year)
    return {
        "key": key,
        "type": entry_type,
        "title": title,
        "authors": authors,
        "year": current_year,
        "journal": "Journal of Important Research",
        "volume": "1",
        "issue": "1",
        "pages": "1--10",
    }


def generate_bibtex_from_title(
    title: str, *, use_api: bool = False, now_year: int = PINNED_YEAR
) -> dict[str, Any]:
    """``generateBibTeXFromTitle`` (:468-539), API-disabled path only —
    the cluster pipeline replaces Semantic Scholar (network, B7) with the
    reference's own mock branch (:515-527)."""
    if use_api:
        raise NotImplementedError(
            "Semantic Scholar lookup (bibtex-generator.ts:378-402) is a "
            "network call; the pipeline runs the deterministic mock path."
        )
    entry = generate_mock_bibtex_entry(title, now_year=now_year)
    entry["titleValidation"] = {
        "matches": False,
        "original_title": title,
        "bibtex_title": entry["title"],
        "normalized_original": normalize_title_for_comparison(title),
        "normalized_bibtex": normalize_title_for_comparison(entry["title"]),
    }
    formatted = format_bibtex_entry(entry)
    return {
        "bibtex": "",  # mock => "" (:534), empty string signals failure in UI
        "title_validation": entry["titleValidation"],
        "used_mock_entry": True,
        "entry": entry,
        "formatted_entry": formatted,
    }


def generate_bibtex_from_markdown(
    markdown_content: str, *, now_year: int = PINNED_YEAR
) -> dict[str, Any]:
    """``generateBibTeXFromMarkdown`` (:549-558)."""
    from .splitter import extract_title

    title = extract_title(markdown_content)
    return generate_bibtex_from_title(title, now_year=now_year)
