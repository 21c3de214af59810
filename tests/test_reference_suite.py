"""CI gate: ALL 209 of the reference's own tests (validator end-to-end,
schema compiler, type-validator units, and the Index walk units via the
create_index view) must pass against okay_spark's drop-in surfaces. See
scripts/reference_suite.py for the aliasing scheme."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_reference_suite_full_parity():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "reference_suite.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert "209 passed" in r.stdout
