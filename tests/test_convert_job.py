"""Single-document convert job (jobs/convert.py): the reference's
interactive one-paper workflow through the cluster pipeline, S7 file
naming (useCopyDownload.ts:306,321,336), byte-identical to the oracle.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_convert_single_pdf_writes_s7_named_sections(tmp_path):
    sys.path.insert(0, str(REPO))
    from paper2llm_spark.oracle.pipeline import convert_ocr_result
    from paper2llm_spark.pdf.parser import parse_pdf
    from paper2llm_spark.pdf.writer import layout_markdown_page, write_pdf

    pages = [
        "# A Test Paper\n\nIntro body text here.",
        "More body.\n\n## References\n\n[1] something.\n\n"
        "## Appendix\n\nApp text.",
    ]
    pdf = write_pdf([layout_markdown_page(p) for p in pages])
    src = tmp_path / "paper.v2.pdf"
    src.write_bytes(pdf)
    out = tmp_path / "out"

    proc = subprocess.run(
        [sys.executable, str(REPO / "jobs" / "convert.py"),
         "--file", str(src), "--output", str(out), "--cpus", "4"],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    # base strips ONLY the last extension (useCopyDownload.ts:74)
    names = sorted(p.name for p in out.iterdir())
    assert names == [
        "paper.v2.md", "paper.v2_appendix.md",
        "paper.v2_backmatter.md", "paper.v2_main.md",
    ]

    # full markdown is byte-identical to the transliterated oracle
    expected = convert_ocr_result(parse_pdf(pdf))["markdown"]
    assert (out / "paper.v2.md").read_text() == expected
