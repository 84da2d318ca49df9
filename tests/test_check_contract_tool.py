"""The local gate tool itself, end-to-end: `check_contract.py
--driver-parity` must run real catalog entries under an Arrow-DISABLED
session and materialize rows-only entries — the exact environment where
round 3's kmeans numpy-typing crash hid from the Arrow-on gate (VERDICT
r03 item #2: the local gate must be a superset of the driver's)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_driver_parity_gate_runs_oracled_and_rows_only_entries():
    """One oracled query + the rows-only kmeans entry (the round-3 red
    row) through the real tool in parity mode: both must grade green in a
    fresh process whose session has Arrow off."""
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "check_contract.py"),
            "--sf", "/root/testdata/sf0.001",
            "--cores", "4",
            "--driver-parity",
            "--only", "dedup_exact", "kmeans_centroids",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "2/2 green" in proc.stdout
    # the rows-only entry was MATERIALIZED (toPandas), not count()-ed
    assert "kmeans_centroids: rows=8 [rows-only, no oracle]" in proc.stdout
