"""Unit tests for tools/full_sweep.py's failure-line surfacing.

Pins the ADVICE r14 fix: a failing leg's FAIL/ERROR lines must be
surfaced from BOTH stdout and stderr (the round-14 flake was a
Py4J/executor exception, which lands on stderr), and the surfaced
lines must be capped so a log-noisy leg cannot flood the output ahead
of the 3000-char tail.  Runs ``run()`` against tiny synthetic child
processes instead of real legs.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

_tool = Path(__file__).resolve().parent.parent / "tools" / "full_sweep.py"
_spec = importlib.util.spec_from_file_location("full_sweep", _tool)
full_sweep = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(full_sweep)


def _run_child(capsys, code: str) -> tuple[bool, str]:
    ok = full_sweep.run("unit-leg", [sys.executable, "-c", code])
    return ok, capsys.readouterr().out


def test_stderr_fail_lines_are_surfaced(capsys):
    code = (
        "import sys;"
        "print('progress bars only');"
        "print('q42_some_query: FAIL hash mismatch', file=sys.stderr);"
        "sys.exit(1)"
    )
    ok, out = _run_child(capsys, code)
    assert not ok
    assert "q42_some_query: FAIL hash mismatch" in out


def test_stdout_fail_lines_still_surfaced(capsys):
    code = "print('q7_other: FAIL row count'); import sys; sys.exit(1)"
    ok, out = _run_child(capsys, code)
    assert not ok
    assert "q7_other: FAIL row count" in out


def test_noisy_leg_is_capped(capsys):
    code = (
        "import sys;"
        "[print(f'ERROR noise {i}', file=sys.stderr) for i in range(500)];"
        "sys.exit(1)"
    )
    ok, out = _run_child(capsys, code)
    assert not ok
    # the surfaced block (everything before the suppression note) is
    # capped at 50 lines; the 3000-char raw tail that follows is the
    # separate, already-bounded diagnostic and may repeat noise lines
    assert "more FAIL/ERROR lines suppressed" in out
    block = out.split("more FAIL/ERROR lines suppressed")[0]
    surfaced = [ln for ln in block.splitlines() if ln.startswith("ERROR noise")]
    assert len(surfaced) == 50


def test_green_leg_prints_ok_only(capsys):
    ok, out = _run_child(capsys, "print('all good: 216/216 green')")
    assert ok
    assert "[OK ]" in out and "FAIL" not in out.replace("FAIL/ERROR", "")


def test_adversarial_check_rejects_unknown_hostile_axis():
    # arg validation lives in tools/adversarial_check.py: a typo'd axis
    # must exit 1 naming it, not silently run the default config
    import subprocess

    p = subprocess.run(
        [sys.executable, str(_tool.parent / "adversarial_check.py"),
         "--names", "a4_monthly_stats", "--hostile", "codgen-off"],
        capture_output=True, text=True,
    )
    assert p.returncode == 1
    assert "unknown --hostile axes" in p.stdout
    assert "codgen-off" in p.stdout
