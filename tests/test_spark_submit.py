"""Packaging target (BASELINE.md): runnable via ``spark-submit --py-files``.

The job file is copied OUTSIDE the repo and the repo is absent from the
submit environment, so every ``paper2llm_spark`` import must resolve from
the zip — exactly the cluster deployment shape (jobs/extract.py header).
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_zip(fixture_pages_path, tmp_path):
    zip_path = tmp_path / "p2l.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for py in sorted((REPO / "paper2llm_spark").rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    job_copy = tmp_path / "extract_job.py"
    shutil.copy(REPO / "jobs" / "extract.py", job_copy)

    out_dir = tmp_path / "out"
    proc = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.driver.memory=4g",
            "--py-files", str(zip_path), str(job_copy),
            "--input", fixture_pages_path, "--output", str(out_dir),
            "--cpus", "4", "--max-groups", "1",
        ],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["groups_processed"] == 1
    assert stats["output_rows"] > 0
