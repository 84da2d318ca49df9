"""North-rule launch path, executed for real: `spark-submit --py-files
dist/pdf_extractor_spark.zip jobs/extract.py` from OUTSIDE the repo
directory (so only the zip provides the package), then a resume re-run
that must skip every committed batch."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)


def _submit(out_dir: str) -> dict:
    env = {k: v for k, v in os.environ.items()}
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    proc = subprocess.run(
        [
            "spark-submit", "--master", "local[8]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", os.path.join(REPO, "dist", "pdf_extractor_spark.zip"),
            os.path.join(REPO, "jobs", "extract.py"),
            "--generate", "40", "--output", out_dir, "--salt-stage1",
        ],
        cwd="/tmp",  # NOT the repo — import must come from --py-files
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = [
        ln for ln in proc.stdout.splitlines() if ln.startswith('{"totals"')
    ]
    assert summary, proc.stdout[-2000:]
    return json.loads(summary[-1])


@pytest.mark.slow
def test_spark_submit_pyfiles_launch_and_resume(tmp_path):
    subprocess.run(
        ["python", os.path.join(REPO, "tools", "package.py")],
        cwd=REPO, check=True, capture_output=True,
    )
    out = str(tmp_path / "run")
    first = _submit(out)
    assert first["totals"]["convs"] == 40
    assert first["executed_now"] > 0

    second = _submit(out)  # resume against the committed checkpoints
    assert second["executed_now"] == 0
    assert second["totals"] == first["totals"]
