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


def test_full_registry_anchor_coverage():
    """Round-10 milestone, kept as a gate: every registry entry's family
    has a third-layer anchor (pure-Python recompute or family law) in at
    least one anchor file.  A new op landing without one fails here."""
    import importlib.util
    from pathlib import Path

    tool = Path(__file__).resolve().parent.parent / "tools" / "anchor_audit.py"
    spec = importlib.util.spec_from_file_location("anchor_audit", tool)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    amap = mod.anchor_map()
    missing = [n for n, fs in amap.items() if not fs]
    assert not missing, f"unanchored registry rows: {missing}"
