"""Guard the precomputed next-round rotation plan against drift.

The ROUND-<N> ROTATION PLAN comment in ``queries/__init__.py`` is the
contract the next round applies verbatim; ``tools/rotation_audit.py``
re-derives the staleness ladder from the committed CORRECTNESS
artifacts and cross-checks the plan (50 names, all never-checked
entries included, no staler row left out).  Registering a new query or
editing the plan without re-balancing the 50 slots fails here instead
of at the driver gate a round later.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_rotation_plan_consistent_with_artifacts():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "rotation_audit.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "plan consistent with artifacts" in proc.stdout
