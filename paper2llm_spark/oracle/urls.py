"""URL algebra — oracle for the domain handlers and file-handler checks.

Transliterates (reference repo lacerbi/paper2llm):

* the seven repository configs and the generic handler dispatch
  (``src/core/domain-handlers/generic-handler.ts:62-164,179-420``);
* registry first-match order arxiv, openreview, acl, biorxiv, medrxiv,
  neurips, mlrp (``generic-handler.ts:410-420``,
  ``domain-handler-registry.ts:40-42``);
* ``ensurePdfExtension`` / fallback filename
  (``src/core/domain-handlers/base-handler.ts:47-52,82-84``);
* ``validatePdf`` / ``validateUrl`` / ``extractFileNameFromUrl``
  (``src/adapters/web/file-handler.ts:247-289,297-329``) — with the MIME
  check replaced by magic-byte payload detection (no MIME in a binary
  column; BASELINE.json input_hint).

Date fallbacks are pinned via ``now_date`` (FIXTURES.md pins 2026-01-01).
"""

from __future__ import annotations

import re
from typing import Callable
from urllib.parse import parse_qs, urlsplit, urlunsplit

PINNED_DATE = "2026-01-01"


class JsUrl:
    """Minimal stand-in for the WHATWG ``URL`` object (throws on invalid)."""

    def __init__(self, url: str):
        parts = urlsplit(url)
        if not parts.scheme or not parts.netloc:
            raise ValueError(f"Invalid URL: {url!r}")
        self.scheme = parts.scheme.lower()
        self.netloc = parts.netloc
        self.hostname = (parts.hostname or "").lower()
        self.pathname = parts.path or "/"
        self.query = parts.query
        self.fragment = parts.fragment

    def search_param(self, name: str) -> str | None:
        vals = parse_qs(self.query, keep_blank_values=True).get(name)
        return vals[0] if vals else None

    def to_string(self) -> str:
        return urlunsplit(
            (self.scheme, self.netloc, self.pathname, self.query, self.fragment)
        )


# ---------------------------------------------------------------------------
# Repository configurations (generic-handler.ts:179-404)
# ---------------------------------------------------------------------------

def _acl_pdf(m: re.Match, u: JsUrl) -> str:
    return f"/{m.group(1)}.pdf"  # :272-274


def _openreview_pdf(m: re.Match, u: JsUrl) -> str:
    return "/pdf"  # :218-236 (both rules)


def _biorxiv_pdf(m: re.Match, u: JsUrl) -> str:
    return f"/content/{m.group(1)}{m.group(2) or ''}.full.pdf"  # :302-304


def _neurips_pdf(m: re.Match, u: JsUrl) -> str:
    return f"{m.group(1)}/file/{m.group(2)}-Paper.pdf"  # :358-361


def _mlrp_pdf(m: re.Match, u: JsUrl) -> str:
    return f"/{m.group(1)}/{m.group(2)}/{m.group(2)}.pdf"  # :391-393


def _openreview_filename(m: re.Match, u: JsUrl) -> str:
    pid = u.search_param("id")
    return f"openreview-{pid}.pdf" if pid else "openreview-paper.pdf"  # :242-251


REPO_CONFIGS: list[dict] = [
    {
        "domain": "arxiv",
        "host_patterns": ["arxiv.org"],
        "url_patterns": [re.compile(r"/(abs|pdf|html)/([0-9]+\.[0-9]+|[\w-]+/[0-9]+)", re.A)],
        "pdf_rules": [
            (re.compile(r"/(abs|html)/", re.A), "/pdf/"),
        ],
        "filename_rules": [
            (re.compile(r"/(abs|pdf|html)/([\w.-]+/?[0-9]+|[0-9]+\.[0-9]+)", re.A), "arxiv-$2.pdf"),
        ],
    },
    {
        "domain": "openreview",
        "host_patterns": ["openreview.net"],
        "url_patterns": [re.compile(r"/(forum|pdf|attachment)", re.A)],
        "pdf_rules": [
            (re.compile(r"/(forum|attachment)", re.A), _openreview_pdf),
            (re.compile(r"/pdf", re.A), _openreview_pdf),
        ],
        "filename_rules": [
            (re.compile(r".*", re.A), _openreview_filename),
        ],
    },
    {
        "domain": "acl",
        "host_patterns": ["aclanthology.org"],
        "url_patterns": [
            re.compile(r"/[0-9]{4}\.\w+-\w+\.[0-9]+", re.A),
            re.compile(r"/[A-Z][0-9]{2}-[0-9]{4}", re.A),
        ],
        "pdf_rules": [
            (re.compile(r"/([^/]+)$", re.A), _acl_pdf),
        ],
        "filename_rules": [
            (re.compile(r"/([^/]+?)(?:\.pdf)?$", re.A), "acl-$1.pdf"),
        ],
    },
    {
        "domain": "biorxiv",
        "host_patterns": ["biorxiv.org"],
        "url_patterns": [re.compile(r"/content/10\.1101/", re.A)],
        "pdf_rules": [
            (
                re.compile(r"/content/(10\.1101/[0-9.]+)(v[0-9]+)?(?:\.full\.pdf|\.full|$)", re.A),
                _biorxiv_pdf,
            ),
        ],
        "filename_rules": [
            (re.compile(r"10\.1101/([0-9.]+)", re.A), "biorxiv-$1.pdf"),
        ],
    },
    {
        "domain": "medrxiv",
        "host_patterns": ["medrxiv.org"],
        "url_patterns": [re.compile(r"/content/10\.1101/", re.A)],
        "pdf_rules": [
            (
                re.compile(r"/content/(10\.1101/[0-9.]+)(v[0-9]+)?(?:\.full\.pdf|\.full|$)", re.A),
                _biorxiv_pdf,
            ),
        ],
        "filename_rules": [
            (re.compile(r"10\.1101/([0-9.]+)", re.A), "medrxiv-$1.pdf"),
        ],
    },
    {
        "domain": "neurips",
        "host_patterns": ["papers.nips.cc", "papers.neurips.cc"],
        "url_patterns": [
            re.compile(r"/paper/", re.A),
            re.compile(r"/paper_files/paper/", re.A),
        ],
        "pdf_rules": [
            (
                re.compile(r"(/paper(?:_files/paper)?/[0-9]{4})/hash/([^/]+)-Abstract\.html", re.A),
                _neurips_pdf,
            ),
        ],
        "filename_rules": [
            (
                re.compile(r"/paper(?:_files/paper)?/([0-9]{4})/(?:hash|file)/([^/\-]+)", re.A),
                "neurips-$1-$2.pdf",
            ),
            (re.compile(r"/(?:hash|file)/([^/\-]+)", re.A), "neurips-$1.pdf"),
        ],
    },
    {
        "domain": "mlrp",
        "host_patterns": ["proceedings.mlr.press"],
        "url_patterns": [re.compile(r"/v[0-9]+/[a-z0-9]+", re.A)],
        "pdf_rules": [
            (re.compile(r"/(v[0-9]+)/([a-z0-9]+)(?:\.html)?$", re.A), _mlrp_pdf),
        ],
        "filename_rules": [
            (re.compile(r"/v([0-9]+)/([a-z0-9]+)", re.A), "mlrp-v$1-$2.pdf"),
        ],
    },
]


def ensure_pdf_extension(url: str) -> str:
    """``ensurePdfExtension`` (base-handler.ts:47-52)."""
    if not url.lower().endswith(".pdf"):
        return f"{url}.pdf"
    return url


def _expand_template(template: str, m: re.Match) -> str:
    """JS ``template.replace(/\\$(\\d+)/g, match[i] || '')``
    (generic-handler.ts:150-152)."""
    def repl(t: re.Match) -> str:
        idx = int(t.group(1))
        try:
            return m.group(idx) or ""
        except (IndexError, re.error):
            return ""
    return re.sub(r"\$([0-9]+)", repl, template)


def can_handle(config: dict, url: str) -> bool:
    """``canHandle`` (generic-handler.ts:62-76)."""
    try:
        u = JsUrl(url)
    except ValueError:
        return False
    if not any(p in u.hostname for p in config["host_patterns"]):
        return False
    return any(pat.search(u.pathname) for pat in config["url_patterns"])


def normalize_pdf_url(config: dict, url: str) -> str:
    """``normalizePdfUrl`` (generic-handler.ts:83-131)."""
    try:
        u = JsUrl(url)
    except ValueError:
        return url
    pathname = u.pathname

    if pathname.lower().endswith(".pdf"):
        return url

    if "openreview.net" in u.hostname:  # :94-108
        pid = u.search_param("id")
        if not pid:
            return url
        u.pathname = "/pdf"
        return u.to_string()

    for pattern, replacement in config["pdf_rules"]:  # :111-123
        m = pattern.search(pathname)
        if m:
            if isinstance(replacement, str):
                # JS String.replace(regex-without-/g, str): first match,
                # $n expansion. Rules that need $n use functions here.
                u.pathname = pattern.sub(replacement.replace("\\", "\\\\"), pathname, count=1)
            else:
                u.pathname = replacement(m, u)
            return ensure_pdf_extension(u.to_string())

    return ensure_pdf_extension(url)  # :126


def get_file_name(config: dict, url: str, now_date: str = PINNED_DATE) -> str:
    """``getFileName`` (generic-handler.ts:139-164)."""
    fallback = f"{config['domain']}-paper-{now_date}.pdf"  # base-handler.ts:82-84
    try:
        u = JsUrl(url)
    except ValueError:
        return fallback
    pathname = u.pathname
    for pattern, template in config["filename_rules"]:
        m = pattern.search(pathname)
        if m:
            if isinstance(template, str):
                return _expand_template(template, m)
            return template(m, u)
    return fallback


def get_handler(url: str) -> dict | None:
    """Registry first-match (domain-handler-registry.ts:40-42; registration
    order generic-handler.ts:410-420)."""
    for config in REPO_CONFIGS:
        if can_handle(config, url):
            return config
    return None


def normalize_url(url: str) -> str:
    """Dispatch: handler-normalized URL, or the URL unchanged."""
    handler = get_handler(url)
    return normalize_pdf_url(handler, url) if handler else url


def url_file_name(url: str, now_date: str = PINNED_DATE) -> str:
    """``extractFileNameFromUrl`` (file-handler.ts:297-329)."""
    default = f"document-{now_date}.pdf"
    try:
        handler = get_handler(url)
        if handler:
            return get_file_name(handler, url, now_date)
        u = JsUrl(url)
        segments = u.pathname.split("/")
        last = segments[-1]
        if last and last.strip() != "":
            if last.lower().endswith(".pdf"):
                return last
            return f"{last}.pdf"
        return default
    except ValueError:
        return default


def validate_url(url: str) -> bool:
    """``validateUrl`` (file-handler.ts:257-289)."""
    try:
        u = JsUrl(url)
    except ValueError:
        return False
    if "openreview.net" in url:
        pid = u.search_param("id")
        return bool(pid and pid.strip() != "")
    if get_handler(url):
        return True
    return url.strip() != ""


def detect_payload(html: bytes) -> str:
    """Magic-byte payload detection replacing MIME sniffing
    (file-handler.ts:247-249 ``validatePdf``, :200-226
    ``checkUrlContentType``): ``%PDF-`` prefix => pdf; an HTML-looking
    prefix => html; empty => empty; anything else => other."""
    if not html:
        return "empty"
    if html[:5] == b"%PDF-":
        return "pdf"
    head = html[:256].lstrip()
    if head[:1] == b"<":
        return "html"
    return "other"
