"""Fixture corpus — synthetic pages table + golden outputs (FIXTURES.md).

Builds the deterministic corpus the byte-identical contract is tested
against: one row per fixture case, in the authoritative input shape
``pages(url, warc_ts, html, text, lang)`` (BASELINE.json input_hint).
PDF payloads come from :mod:`paper2llm_spark.pdf.writer`; HTML payloads
are literal bytes; error rows carry garbage. Golden outputs are computed
by parsing the payload with the same pure functions the Spark UDFs use
and running the oracle pipeline — one implementation, two call sites.

Run ``python -m paper2llm_spark.pdf.fixtures OUTDIR`` to materialize the
corpus as a parquet pages table for manual driving.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from ..html_extract import html_to_ocr_result
from ..oracle.pipeline import convert_ocr_result
from ..oracle.urls import detect_payload
from .parser import parse_pdf
from .writer import layout_markdown_page, two_column_page, write_pdf

BASE_TS = _dt.datetime(2026, 1, 1, 0, 0, 0)


def _pdf(pages_md: list[str]) -> bytes:
    return write_pdf([layout_markdown_page(md) for md in pages_md])


def _doc(name: str, url: str, payload: bytes, *, text: str = "", lang: str = "en") -> dict:
    return {"name": name, "url": url, "payload": payload, "text": text, "lang": lang}


def _fixture_docs() -> list[dict[str, Any]]:
    docs: list[dict[str, Any]] = []

    # ---------------- F-ASSEMBLE ----------------
    docs.append(_doc("A1", "https://fixtures.test/assemble/a1",
                     _pdf(["# Single Page Doc\n\nJust one page of body text."])))
    docs.append(_doc("A2", "https://fixtures.test/assemble/a2",
                     _pdf(["# Three Pages\n\nPage one body.",
                           "Page two body.",
                           "Page three body."])))
    # A3: \n{3,} runs inside one text element (hand-authored elements)
    docs.append(_doc("A3", "https://fixtures.test/assemble/a3", write_pdf([
        [("text", 50, 742, 24, "Newline Collapse"),
         ("text", 50, 714, 11, "alpha\n\n\nbeta\n\n\n\n\ngamma")],
    ])))
    docs.append(_doc("A5", "https://fixtures.test/assemble/a5",
                     _pdf(["# Empty Middle\n\nPage one.", "", "Page three."])))
    docs.append(_doc("A6-large", "https://fixtures.test/assemble/a6-large",
                     _pdf([f"## Chapter {i}\n\nBody of chapter {i}. " * 1 + f"\nLine two of chapter {i}."
                           for i in range(40)])))

    # ---------------- F-HEADINGS ----------------
    docs.append(_doc("H1-levels", "https://fixtures.test/headings/h1",
                     _pdf(["# Level One\n\n## Level Two\n\n### Level Three\n\n"
                           "#### Level Four\n\n##### Level Five\n\n###### Level Six\n\nBody."])))
    docs.append(_doc("H3-bibtex-title", "https://fixtures.test/headings/h3",
                     _pdf(["No heading here but title={Fallback From BibTeX} appears.\n\nBody text."])))
    docs.append(_doc("H4-untitled", "https://fixtures.test/headings/h4",
                     _pdf(["No title anywhere.\n\nJust body."])))

    # ---------------- F-IMAGES ----------------
    docs.append(_doc("I1", "https://fixtures.test/images/i1",
                     _pdf(["# Image Doc One\n\nText before.\n\n![img-0.jpeg](img-0.jpeg)\n\nText after."])))
    docs.append(_doc("I2-caption", "https://fixtures.test/images/i2",
                     _pdf(["# Caption Doc\n\nIntro.\n\n![img-0.jpeg](img-0.jpeg)\nFigure 1: the caption line.\n\nAfter."])))
    docs.append(_doc("I5-duplicate-refs", "https://fixtures.test/images/i5",
                     _pdf(["# Duplicate Refs\n\n![img-0.jpeg](img-0.jpeg)\n\nmiddle text\n\n![img-1.jpeg](img-1.jpeg)"])))
    docs.append(_doc("I7-trailing-image", "https://fixtures.test/images/i7",
                     _pdf(["# Trailing Image\n\nBody.\n\n![img-0.jpeg](img-0.jpeg)"])))
    docs.append(_doc("I-multi-page-images", "https://fixtures.test/images/multi",
                     _pdf(["# Multi Image\n\n![img-0.jpeg](img-0.jpeg)\n\nPage one.",
                           "Page two intro.\n\n![img-1.jpeg](img-1.jpeg)\n\nPage two end."])))

    # ---------------- F-REFLOW ----------------
    docs.append({"name": "R1-two-column", "url": "https://fixtures.test/reflow/r1",
                 "payload": write_pdf([two_column_page(
                     "# Two Column Paper\n\nLeft column first line.\nLeft column second line.",
                     "Right column first line.\nRight column second line.")]),
                 "text": "", "lang": "en"})
    docs.append(_doc("R2-equations", "https://fixtures.test/reflow/r2",
                     _pdf(["# Equation Doc\n\nInline $E = mc^2$ stays.\n\n"
                           "$$\\int_0^1 f(x) dx = F(1) - F(0)$$\n\n"
                           "Superscript ${ }^{1}$ stays too."])))
    docs.append(_doc("R3-table", "https://fixtures.test/reflow/r3",
                     _pdf(["# Table Doc\n\n| a | b |\n| - | - |\n| 1 | 2 |\n\nAfter table."])))

    # ---------------- F-SPLIT ----------------
    split_cases = {
        "S1-ack": "# Split One\n\nBody.\n\n## Acknowledgments\n\nThanks to all.",
        "S2-refs": "# Split Two\n\nBody.\n\n## References\n\n[1] A citation.",
        "S3-appendix": "# Split Three\n\nBody.\n\n## Appendix\n\nExtra material.",
        "S4-both": "# Split Four\n\nBody.\n\n## Acknowledgments\n\nThanks.\n\n## Appendix\n\nExtra.",
        "S5-bareA-before": "# Split Five\n\n## A Early Section\n\nStuff.\n\n## References\n\n[1] x.",
        "S6-bareA-after": "# Split Six\n\nBody.\n\n## References\n\n[1] x.\n\n## A Proofs\n\nLemma.",
        "S11-supplementary": "# Split Eleven\n\nBody.\n\n## Supplementary Material\n\nTables.",
        "S12-words": "# Split Twelve\n\none two three four five.\n\n## References\n\nsix seven.",
    }
    for name, md in split_cases.items():
        docs.append(_doc(name, f"https://fixtures.test/split/{name.lower()}", _pdf([md])))
    # S7/S9: page-marker + ack-in-appendix interplay across pages
    docs.append(_doc("S7-marker", "https://fixtures.test/split/s7-marker",
                     _pdf(["# Marker Doc\n\nMain body text.",
                           "## References\n\n[1] Cite."])))
    docs.append(_doc("S9-ack-in-appendix", "https://fixtures.test/split/s9",
                     _pdf(["# Ack In Appendix\n\nBody.\n\n## References\n\n[1] x.\n\n"
                           "## Appendix\n\nExtra.\n\n## Acknowledgments\n\nThanks inside."])))

    # ---------------- F-BIBTEX ----------------
    docs.append(_doc("B2-sanitize-title", "https://fixtures.test/bibtex/b2",
                     _pdf(["# Costs & Benefits: 100% of $Value$ #1\n\nBody."])))
    docs.append(_doc("B3-key", "https://fixtures.test/bibtex/b3",
                     _pdf(["# On the Convergence of Adaptive Methods\n\nBody."])))

    # ---------------- F-HTML (north_rule HTML branch) ----------------
    html1 = (b"<!DOCTYPE html><html><head><title>An HTML Article</title>"
             b"<script>x()</script><style>s{}</style></head><body>"
             b"<nav><li>Home</li></nav><header>hdr</header>"
             b"<main><h1>An HTML Article</h1><p>First para.</p>"
             b"<p>Second para with <b>markup</b>.</p>"
             b"<img src='fig-1.png'/><h2>References</h2><p>[1] Cited.</p></main>"
             b"<footer>ftr</footer></body></html>")
    docs.append(_doc("W1-html", "https://fixtures.test/html/w1", html1,
                     text="An HTML Article First para. Second para with markup."))
    html2 = (b"<html><head><title>Title Only Page</title></head><body>"
             b"<div>Content paragraph one.</div><div>Content paragraph two.</div>"
             b"</body></html>")
    docs.append(_doc("W2-html-title", "https://fixtures.test/html/w2", html2,
                     text="Title Only Page Content paragraph one."))
    html3 = (b"<html><head><title>Rich Structures</title></head><body>"
             b"<main><h1>Rich Structures</h1>"
             b"<p>See <a href='https://x.test/a'>the paper</a> with "
             b"<strong>bold</strong>, <em>ital</em> and <code>f(x)</code>.</p>"
             b"<pre>def f():\n    return 1</pre>"
             b"<table><tr><th>k</th><th>v</th></tr>"
             b"<tr><td>a</td><td>1</td></tr><tr><td>b</td><td>2</td></tr></table>"
             b"<h2>References</h2><p>[1] Linked.</p></main></body></html>")
    docs.append(_doc("W3-html-rich", "https://fixtures.test/html/w3", html3,
                     text="Rich Structures table code links"))

    # ---------------- F-URL (algebra exercised via url column) ----------------
    docs.append(_doc("U1-arxiv", "https://arxiv.org/abs/2401.00042",
                     _pdf(["# An ArXiv Paper\n\nBody."])))
    docs.append(_doc("U2-openreview", "https://openreview.net/forum?id=AbCd123",
                     _pdf(["# An OpenReview Paper\n\nBody."])))
    docs.append(_doc("U3-acl", "https://aclanthology.org/2024.acl-long.123",
                     _pdf(["# An ACL Paper\n\nBody."])))
    docs.append(_doc("U4-neurips",
                     "https://papers.nips.cc/paper_files/paper/2023/hash/abc123-Abstract.html",
                     _pdf(["# A NeurIPS Paper\n\nBody."])))
    docs.append(_doc("U5-mlr", "https://proceedings.mlr.press/v202/smith23a.html",
                     _pdf(["# An MLR Paper\n\nBody."])))
    docs.append(_doc("U6-biorxiv",
                     "https://www.biorxiv.org/content/10.1101/2024.01.01.573456v2",
                     _pdf(["# A BioRxiv Paper\n\nBody."])))

    # ---------------- F-ERROR (quarantine rows) ----------------
    docs.append(_doc("X1-garbage", "https://fixtures.test/error/x1",
                     b"%PDF-1.4 truncated garbage without structure"))
    docs.append(_doc("X2-non-en", "https://fixtures.test/error/x2",
                     _pdf(["# Ein Deutsches Papier\n\nInhalt."]), lang="de"))
    docs.append(_doc("X3-empty", "https://fixtures.test/error/x3", b""))
    docs.append(_doc("X4-binary-junk", "https://fixtures.test/error/x4",
                     b"\x00\x01\x02 not pdf not html"))

    return docs


def fixture_docs() -> list[dict[str, Any]]:
    """The corpus, with per-row warc_ts assigned deterministically."""
    docs = _fixture_docs()
    for i, doc in enumerate(docs):
        doc["warc_ts"] = BASE_TS + _dt.timedelta(minutes=i)
    return docs


def pages_rows() -> list[dict[str, Any]]:
    """Rows in the authoritative input-table shape."""
    return [
        {
            "url": d["url"],
            "warc_ts": d["warc_ts"],
            "html": d["payload"],
            "text": d["text"],
            "lang": d["lang"],
        }
        for d in fixture_docs()
    ]


def golden_outputs(process_images: bool = False) -> dict[str, dict[str, Any]]:
    """url -> oracle result for every non-quarantined 'en' doc.

    Mirrors the pipeline's routing: payload magic bytes pick the branch
    (pdf parse | html extract); 'en'-filter and parse failures drop rows
    (F-ERROR family). This is the golden the Spark output must match
    byte-for-byte per url.
    """
    goldens: dict[str, dict[str, Any]] = {}
    for doc in fixture_docs():
        if doc["lang"] != "en":
            continue
        kind = detect_payload(doc["payload"])
        try:
            if kind == "pdf":
                ocr = parse_pdf(doc["payload"])
            elif kind == "html":
                ocr = html_to_ocr_result(doc["payload"])
            else:
                continue
        except Exception:
            continue  # quarantine
        goldens[doc["url"]] = convert_ocr_result(ocr, process_images=process_images)
    return goldens


def write_pages_parquet(path: str) -> int:
    """Materialize the corpus as a parquet pages table; returns row count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = pages_rows()
    table = pa.table(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        }
    )
    pq.write_table(table, path)
    return len(rows)


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pages_fixture.parquet"
    n = write_pages_parquet(out)
    print(f"wrote {n} fixture rows to {out}")
