"""Round-12 staged pool — REGISTERED in round 11 (re-homed, pointers kept).

The four ops staged here in round 10 (dd20 exact-substring dedup, a28
HyperLogLog distinct sketch, a29 count-min heavy hitters, st9 stream-join
state audit) were registered with the driver in round 11 per the VERDICT
r10 item-3 checklist: each implementation (and its oracle SQL) moved
verbatim into its family module and is ``@register``'d there BELOW the
driver prefix —

* ``dd20_exact_substring_dedup`` → :mod:`.dedup`
* ``a28_hll_distinct_sketch`` / ``a29_cms_heavy_hitters`` → :mod:`.aggregates`
* ``st9_join_state_audit`` → :mod:`.multimodal` (the st* family home)

This module keeps the ``STAGED`` pointers aimed at the moved objects so
the pool's dedicated verification file (``tests/test_staged_r12.py`` —
driver-strict oracle compare at 3 SFs, pure-Python replays, family laws,
plan sweep) keeps exercising exactly the registered code.  Design
rationale and 100 TB scale-shape notes live with the implementations;
the original staging-era discussion is in git history (this file at
commit e388fda).
"""

from __future__ import annotations

from dataclasses import dataclass

from .aggregates import a28_hll_distinct_sketch, a29_cms_heavy_hitters
from .dedup import dd20_exact_substring_dedup
from .multimodal import st9_join_state_audit


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
        ("dd20_exact_substring_dedup", dd20_exact_substring_dedup),
        ("a28_hll_distinct_sketch", a28_hll_distinct_sketch),
        ("a29_cms_heavy_hitters", a29_cms_heavy_hitters),
        ("st9_join_state_audit", st9_join_state_audit),
    ]
}
