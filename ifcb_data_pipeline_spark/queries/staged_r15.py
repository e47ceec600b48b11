"""Round-15 staged pool — REGISTERED in round 14 (re-homed, pointers kept).

The four ops staged here in round 13 (a30 KMV bottom-k distinct sketch,
j18 deterministic Bloom-filter join pre-filter, w15 exact two-sample
Kolmogorov–Smirnov, dp13 Benford leading-digit audit) were registered
with the driver in round 14 per the VERDICT r13 item-2 checklist — the
LAST registrations before the 216-entry freeze.  Each implementation
(and its oracle SQL) moved verbatim into its family module and is
``@register``'d there BELOW the driver prefix —

* ``a30_bottomk_distinct_sample`` → :mod:`.aggregates` (the a-family
  home, next to its sketch-series siblings a28 HLL / a29 count-min)
* ``j18_bloom_join_prefilter`` → :mod:`.joins`
* ``w15_ks_two_sample`` → :mod:`.windows_sorts`
* ``dp13_leading_digit_audit`` → :mod:`.profiling` (the dp-family home)

This module keeps the ``STAGED`` pointers aimed at the moved objects so
the pool's dedicated verification file (``tests/test_staged_r15.py`` —
driver-strict oracle compare at 3 SFs, pure-Python replays, family laws,
the dp13 log10 three-engine bit-parity pin, plan sweep) keeps exercising
exactly the registered code.  Design rationale, float policy, and 100 TB
scale-shape notes live with the implementations; the original
staging-era discussion is in git history (this file at commit 8007387).
"""

from __future__ import annotations

from dataclasses import dataclass

from .aggregates import _A30_K, a30_bottomk_distinct_sample  # noqa: F401
from .joins import (  # noqa: F401 (constants re-exported for the tests)
    _J18_HASHES,
    _J18_M,
    j18_bloom_join_prefilter,
)
from .profiling import dp13_leading_digit_audit
from .windows_sorts import w15_ks_two_sample


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
        ("a30_bottomk_distinct_sample", a30_bottomk_distinct_sample),
        ("j18_bloom_join_prefilter", j18_bloom_join_prefilter),
        ("w15_ks_two_sample", w15_ks_two_sample),
        ("dp13_leading_digit_audit", dp13_leading_digit_audit),
    ]
}
