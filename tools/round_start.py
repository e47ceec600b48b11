#!/usr/bin/env python
"""One-shot round-start checklist (builder convenience).

Runs, in order, the three gates every round opens with and prints a
single PASS/FAIL summary:

1. ``rotation_audit``  — the precomputed plan vs the CORRECTNESS ladder
   (a red row in the newest artifact displaces slot 1 BY RULE — this
   tool only reports; re-balancing is a deliberate edit).
2. ``anchor_audit``    — full-registry third-layer anchor coverage
   under the strict (def-line / marker) matcher.
3. ``preflight``       — the live 50-prefix through the bit-level
   pandas-path driver-sim at sf0.01.

Usage: python tools/round_start.py
Exit 0 only if all three pass.  Typical round-start sequence:
run this, commit any driver-written artifacts, apply the precomputed
rotation if the newest CORRECTNESS is all-green, re-run this, build.
After any registration or query edit, additionally run
``tools/adversarial_check.py --names <touched keys>`` (the r8-precedent
merge-order sweep) before committing the round's ledger entry.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
STEPS = [
    ("rotation_audit", [sys.executable, "tools/rotation_audit.py"]),
    ("anchor_audit", [sys.executable, "tools/anchor_audit.py"]),
    ("preflight", [sys.executable, "tools/preflight.py"]),
]


def main() -> int:
    results = {}
    for name, cmd in STEPS:
        proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
        results[name] = proc.returncode
        tail = "\n".join((proc.stdout + proc.stderr).strip().split("\n")[-3:])
        print(f"--- {name}: {'PASS' if proc.returncode == 0 else 'FAIL'}")
        print(tail)
    bad = [n for n, rc in results.items() if rc]
    print(f"\nround-start: {'ALL GREEN' if not bad else 'FAILING: ' + ', '.join(bad)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
