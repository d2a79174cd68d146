"""Section splitting — oracle for ``markdown-splitter.ts``.

Transliterates ``src/core/utils/markdown-splitter.ts`` (reference repo
lacerbi/paper2llm): title extraction (:69-84), section-boundary search
(:92-263), content split (:271-318), word counts (:326-332), metadata
(:340-362) and formatted-section preparation (:372-404).

Reproduced quirks:

* initial ack/appendix searches keep the EARLIEST match across all
  patterns, strict ``<`` so the first pattern in list order wins ties
  (:132-138, :144-160);
* the bare ``A `` / ``A. `` appendix patterns are only guarded when an
  ack boundary exists; with no ack they are accepted unconditionally
  (:148-158);
* page-marker pull-in scans the last <=5 lines before a boundary and only
  moves the boundary when nothing but whitespace separates marker and
  heading (:182-224, emptiness check :170-179);
* if ack lands after appendix, ack is re-searched within
  ``[0, appendixStart)`` — this re-search takes the FIRST PATTERN in list
  order that matches (``break`` at :256), not the earliest index;
* each split part gets a single trailing ``/---\\s*$/`` strip ($ = end of
  string, no /m) then ``.trim()`` (:302-309).
"""

from __future__ import annotations

import re

from .jsstr import JS_WS_CLASS, js_trim

_S = "[" + JS_WS_CLASS + "]"

_F = re.A | re.I | re.M

# ackPatterns (markdown-splitter.ts:95-112), in list order.
ACK_PATTERNS = [
    re.compile(r"^#+" + _S + r"+(Acknowledgments?)\b", _F),
    re.compile(r"^#+" + _S + r"+(Acknowledgements?)\b", _F),
    re.compile(r"^#+" + _S + r"+Author" + _S + r"+(Contributions|contributions)", _F),
    re.compile(r"^#+" + _S + r"+Funding", _F),
    re.compile(r"^#+" + _S + r"+Impact" + _S + r"+(Statement|statement)", _F),
    re.compile(r"^#+" + _S + r"+Broader" + _S + r"+(Impact|impact)", _F),
    re.compile(r"^#+" + _S + r"+Societal" + _S + r"+(Impact|impact)", _F),
    re.compile(r"^#+" + _S + r"+Ethical" + _S + r"+(Considerations|considerations)", _F),
    re.compile(r"^#+" + _S + r"+(References|Bibliography)\b", _F),
    re.compile(r"^#+" + _S + r"+Works" + _S + r"+Cited\b", _F),
    re.compile(r"^#+" + _S + r"+Literature" + _S + r"+Cited\b", _F),
    re.compile(r"^#+" + _S + r"+Citations?\b", _F),
    re.compile(r"^#+" + _S + r"+References" + _S + r"+and" + _S + r"+Notes\b", _F),
    re.compile(r"^#+" + _S + r"+References" + _S + r"+Cited\b", _F),
    re.compile(r"^#+" + _S + r"+Cited" + _S + r"+(Works|Literature)\b", _F),
]

# appendixPatterns (markdown-splitter.ts:115-123), in list order.
# Indices of the guarded bare "A " / "A. " patterns: 5 and 6.
APPENDIX_PATTERNS = [
    re.compile(r"^#+" + _S + r"+(Appendix|Appendices|appendix|appendices)\b", _F),
    re.compile(
        r"^#+" + _S + r"+(Supplementary|Supporting|supplementary|supporting)"
        + _S + r"+(Material|Materials|Information|Data|material|materials|information|data)",
        _F,
    ),
    re.compile(r"^#+" + _S + r"+(Supplemental|supplemental)" + _S, _F),
    re.compile(r"^#+" + _S + r"+SI" + _S, _F),
    re.compile(r"^#+" + _S + r"+S[0-9]+\." + _S, _F),
    re.compile(r"^#+" + _S + r"+A" + _S, _F),
    re.compile(r"^#+" + _S + r"+A\." + _S, _F),
]
_GUARDED_APPENDIX_IDX = {5, 6}

# /^#{3,4}\s+Page\s+\d+\s*$/mi  (:126)
PAGE_MARKER_RE = re.compile(
    r"^#{3,4}" + _S + r"+Page" + _S + r"+[0-9]+" + _S + r"*$", _F
)

# /^# (.+?)$/m  (:71) -- JS `.` excludes \\n \\r U+2028 U+2029; spell the
# class out instead of Python's `.` (which only excludes \\n).
_TITLE_RE = re.compile(r"^# ([^\n\r\u2028\u2029]+?)$", re.A | re.M)
# /title={([^}]*)}/  (:77)
_BIBTEX_TITLE_RE = re.compile(r"title=\{([^}]*)\}", re.A)

# /---\s*$/ with JS $ = absolute end (no /m) → \Z  (:302-309)
_TRAILING_HR_RE = re.compile(r"---" + _S + r"*\Z", re.A)

# /^\s+$/ splitting for countWords (:330) — JS split(/\s+/)
_WS_SPLIT_RE = re.compile(_S + r"+", re.A)


def extract_title(content: str) -> str:
    """``extractTitle`` (markdown-splitter.ts:69-84)."""
    m = _TITLE_RE.search(content)
    if m:
        return js_trim(m.group(1))
    m = _BIBTEX_TITLE_RE.search(content)
    if m:
        return js_trim(m.group(1))
    return "Untitled_Paper"


def _has_content_between_markers(content: str, marker_pos: int, heading_pos: int) -> bool:
    """``hasContentBetweenMarkers`` (:170-179)."""
    content_between = js_trim(content[marker_pos:heading_pos])
    lines = content_between.split("\n")[1:]
    return any(len(js_trim(line)) > 0 for line in lines)


def _pull_in_page_marker(content: str, boundary: int) -> int:
    """Page-marker pull-in for one boundary (:182-224)."""
    content_before = content[:boundary]
    lines_before = content_before.split("\n")
    for i in range(len(lines_before) - 1, max(0, len(lines_before) - 5) - 1, -1):
        if PAGE_MARKER_RE.search(lines_before[i]):
            line_pos = content_before.rfind(lines_before[i])
            if line_pos >= 0:
                if not _has_content_between_markers(content, line_pos, boundary):
                    return line_pos
            break
    return boundary


# shared prefix of every ack/appendix pattern: a heading-line start.
# One finditer pass collects candidate positions; each pattern then
# anchor-matches only at candidates instead of re-scanning the whole
# document (22 patterns x 46 MB on a 30k-page doc = ~5.6 s -> ~0.6 s).
# Exactness: every pattern match must start where `^#+\s+` matches (same
# flags, same `^` semantics), candidates ascend, and Pattern.match(s, pos)
# evaluates `^`/`\b` against the FULL string — so the first anchored
# match equals Pattern.search()'s match, byte for byte.
_HEADING_RE = re.compile(r"^#+" + _S + r"+", _F)


def _first_match_at(pattern, content: str, candidates: list[int]):
    for pos in candidates:
        m = pattern.match(content, pos)
        if m:
            return m
    return None


def find_section_boundaries(content: str) -> tuple[int | None, int | None]:
    """``findSectionBoundaries`` (markdown-splitter.ts:92-263)."""
    heads = [m.start() for m in _HEADING_RE.finditer(content)]

    # Acknowledgment search: earliest index across patterns (:129-138).
    ack_start: int | None = None
    for pattern in ACK_PATTERNS:
        m = _first_match_at(pattern, content, heads)
        if m and (ack_start is None or m.start() < ack_start):
            ack_start = m.start()

    # Appendix search with the A-pattern guard (:141-160).
    appendix_start: int | None = None
    for idx, pattern in enumerate(APPENDIX_PATTERNS):
        m = _first_match_at(pattern, content, heads)
        if m and (appendix_start is None or m.start() < appendix_start):
            if idx in _GUARDED_APPENDIX_IDX and ack_start is not None:
                if m.start() > ack_start:
                    appendix_start = m.start()
            else:
                appendix_start = m.start()

    # Page-marker pull-in for each boundary (:182-224).
    if ack_start is not None:
        ack_start = _pull_in_page_marker(content, ack_start)
    if appendix_start is not None:
        appendix_start = _pull_in_page_marker(content, appendix_start)

    # Ack-after-appendix re-search (:227-260): first matching PATTERN in
    # list order wins (break), unlike the initial earliest-index search.
    if ack_start is not None and appendix_start is not None and ack_start > appendix_start:
        ack_content = content[:appendix_start]
        ack_start = None
        for pattern in ACK_PATTERNS:
            m = pattern.search(ack_content)
            if m:
                ack_start = m.start()
                ack_start = _pull_in_page_marker(content, ack_start)
                break

    return ack_start, appendix_start


def _strip_trailing_hr(text: str) -> str:
    """``.replace(/---\\s*$/, '').trim()`` (:302-309)."""
    return js_trim(_TRAILING_HR_RE.sub("", text, count=1))


def split_markdown_content(content: str) -> dict[str, str | None]:
    """``splitMarkdownContent`` (markdown-splitter.ts:271-318)."""
    title = extract_title(content)
    ack_start, appendix_start = find_section_boundaries(content)

    main_content = content
    backmatter: str | None = None
    appendix: str | None = None

    if appendix_start is not None:
        appendix = content[appendix_start:]
        main_content = content[:appendix_start]

    if ack_start is not None:
        if appendix_start is not None and ack_start > appendix_start:
            pass  # ack inside appendix — handled by the boundary re-search
        else:
            backmatter = main_content[ack_start:]
            main_content = main_content[:ack_start]

    main_content = _strip_trailing_hr(main_content)
    if backmatter:
        backmatter = _strip_trailing_hr(backmatter)
    if appendix:
        appendix = _strip_trailing_hr(appendix)

    return {
        "main_content": main_content,
        "backmatter": backmatter,
        "appendix": appendix,
        "title": title,
    }


def count_words(text: str | None) -> int:
    """``countWords`` (markdown-splitter.ts:326-332).

    Semantics: ``split(/\\s+/).filter(w => w.length > 0).length``. With a
    greedy one-or-more separator, empty parts can only appear at the two
    ends (a maximal whitespace run absorbs all contiguous separators),
    so the filter reduces to end-adjustment arithmetic — no 10^7-element
    Python loop on a 46 MB document."""
    if not text:
        return 0
    parts = _WS_SPLIT_RE.split(text)
    n = len(parts)
    if parts[0] == "":
        n -= 1
    if len(parts) > 1 and parts[-1] == "":
        n -= 1
    return n


def get_markdown_sections_metadata(content: str) -> dict:
    """``getMarkdownSectionsMetadata`` (markdown-splitter.ts:340-362)."""
    sections = split_markdown_content(content)
    wc_main = count_words(sections["main_content"])
    wc_back = count_words(sections["backmatter"]) if sections["backmatter"] else None
    wc_app = count_words(sections["appendix"]) if sections["appendix"] else None
    total = wc_main + (wc_back or 0) + (wc_app or 0)
    return {
        "has_backmatter": sections["backmatter"] is not None,
        "has_appendix": sections["appendix"] is not None,
        "word_count": {
            "main_content": wc_main,
            "backmatter": wc_back,
            "appendix": wc_app,
            "total": total,
        },
        "title": sections["title"],
    }


def format_section_with_header(content: str, title: str, section_name: str) -> str:
    """``formatSectionWithHeader`` (markdown-splitter.ts:372-374)."""
    return f"# {title} - {section_name}\n\n---\n\n{content}"


_FIRST_H1_RE = re.compile(r"^# .*$", re.A | re.M)


def prepare_formatted_sections(sections: dict) -> dict:
    """``prepareFormattedSections`` (markdown-splitter.ts:382-404).

    JS ``replace(/^# .*$/m, ...)`` without /g replaces the first match
    only; ``$``-patterns in the replacement are expanded — a title
    containing ``$&`` etc. would be expanded by JS, reproduced here via
    template expansion on the replacement string.
    """
    title = sections["title"]
    replacement = f"# {title}"

    def _sub(m: re.Match) -> str:
        # expand JS replacement patterns against this match
        out = []
        i = 0
        s = replacement
        while i < len(s):
            if s[i] == "$" and i + 1 < len(s):
                nxt = s[i + 1]
                if nxt == "$":
                    out.append("$"); i += 2; continue
                if nxt == "&":
                    out.append(m.group(0)); i += 2; continue
                if nxt == "`":
                    out.append(m.string[: m.start()]); i += 2; continue
                if nxt == "'":
                    out.append(m.string[m.end():]); i += 2; continue
            out.append(s[i]); i += 1
        return "".join(out)

    main_content = _FIRST_H1_RE.sub(_sub, sections["main_content"], count=1)
    backmatter = (
        format_section_with_header(sections["backmatter"], title, "Backmatter")
        if sections["backmatter"]
        else None
    )
    appendix = (
        format_section_with_header(sections["appendix"], title, "Appendix")
        if sections["appendix"]
        else None
    )
    return {"main_content": main_content, "backmatter": backmatter, "appendix": appendix}
