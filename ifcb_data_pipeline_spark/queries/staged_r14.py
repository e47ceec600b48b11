"""Round-14 staged pool — REGISTERED in round 13 (re-homed, pointers kept).

The four ops staged here in round 10 (i13 incremental MinHash signature
maintenance, sp12 leakage-safe group-atomic split balance, w14 per-user
Spearman rank trend, o10 zone-map file-skipping effectiveness) were
registered with the driver in round 13 per the VERDICT r12 item-4
checklist: each implementation (and its oracle SQL) moved verbatim into
its family module and is ``@register``'d there BELOW the driver prefix —

* ``i13_incremental_minhash`` → :mod:`.joins` (the i-family home)
* ``sp12_grouped_split_balance`` → :mod:`.text` (the sp-family home)
* ``w14_spearman_trend`` → :mod:`.windows_sorts`
* ``o10_file_skipping_stats`` → :mod:`.windows_sorts`

This module keeps the ``STAGED`` pointers aimed at the moved objects so
the pool's dedicated verification file (``tests/test_staged_r14.py`` —
driver-strict oracle compare at 3 SFs, pure-Python replays, family laws,
plan sweep) keeps exercising exactly the registered code.  Design
rationale, neighbor-op contrasts (dd2/sp1/w11/o8), float policy, and
100 TB scale-shape notes live with the implementations; the original
staging-era discussion is in git history (this file at commit 6ff7873).
"""

from __future__ import annotations

from dataclasses import dataclass

from .joins import _I13_PERMS, i13_incremental_minhash  # noqa: F401 (re-export)
from .text import sp12_grouped_split_balance
from .windows_sorts import (  # noqa: F401 (constants re-exported for the tests)
    _O10_FILE_DOCS,
    _O10_THRESHOLDS,
    o10_file_skipping_stats,
    w14_spearman_trend,
)


@dataclass(frozen=True)
class StagedDef:
    fn: object
    oracle: str
    survey_ref: str = ""


def _from_registry(name, fn) -> StagedDef:
    # the pool's tests must see the SAME oracle the driver sees
    from . import REGISTRY

    qdef = REGISTRY[name]
    assert qdef.fn is fn, f"{name}: registry fn is not the re-homed fn"
    return StagedDef(fn=qdef.fn, oracle=qdef.oracle, survey_ref=qdef.survey_ref)


STAGED: dict[str, StagedDef] = {
    name: _from_registry(name, fn)
    for name, fn in [
        ("i13_incremental_minhash", i13_incremental_minhash),
        ("sp12_grouped_split_balance", sp12_grouped_split_balance),
        ("w14_spearman_trend", w14_spearman_trend),
        ("o10_file_skipping_stats", o10_file_skipping_stats),
    ]
}
