"""Round-start preflight: one command that certifies the tree before
any round work begins.

    python tools/preflight.py [sf_dir]

Runs, in order, stopping at the first failure:

1. ``tools/rotation_audit.py`` — staleness ladder from the committed
   CORRECTNESS artifacts vs the recorded next-round rotation plan
   (also surfaces red rows from the just-landed round's gate, which by
   rule take the first slots of the new prefix);
2. the registry-wide DuckDB oracle type lint
   (``tests/test_oracle_types.py`` — Spark-free, seconds);
3. ``tools/driver_sim.py`` over the live 50-entry prefix at sf0.01 —
   the pandas-level replica of the driver gate.

Green preflight = safe to rotate PREFIX_ORDER and start building.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def run(label: str, cmd: list[str]) -> None:
    print(f"\n=== preflight: {label} ===", flush=True)
    proc = subprocess.run(cmd, cwd=REPO)
    if proc.returncode != 0:
        print(f"preflight FAILED at: {label}")
        raise SystemExit(proc.returncode)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    run("rotation audit", [sys.executable, "tools/rotation_audit.py"])
    run(
        "oracle type lint",
        [sys.executable, "-m", "pytest", "tests/test_oracle_types.py", "-q"],
    )
    run("prefix driver-sim", [sys.executable, "tools/driver_sim.py", sf_dir])
    print("\npreflight green — safe to rotate the prefix and build")


if __name__ == "__main__":
    main()
