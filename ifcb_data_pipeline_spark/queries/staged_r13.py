"""Round-13 staged pool — REGISTERED in round 12 (re-homed, pointers kept).

The four ops staged here in round 10 (tx16 en-trained bigram vocabulary
coverage, pk4 content-defined chunking, w13 per-user median/MAD anomaly
gate, sim13 per-dimension int8 quantization fidelity) were registered
with the driver in round 12 per the VERDICT r11 item-3 checklist: each
implementation (and its oracle SQL) moved verbatim into its family
module and is ``@register``'d there BELOW the driver prefix —

* ``tx16_bigram_vocab_coverage`` → :mod:`.text`
* ``pk4_cdc_chunking`` → :mod:`.packing`
* ``w13_mad_anomaly`` → :mod:`.windows_sorts`
* ``sim13_int8_quant_error`` → :mod:`.similarity`

This module keeps the ``STAGED`` pointers aimed at the moved objects so
the pool's dedicated verification file (``tests/test_staged_r13.py`` —
driver-strict oracle compare at 3 SFs, pure-Python replays, family laws,
plan sweep) keeps exercising exactly the registered code.  Design
rationale, neighbor-op contrasts (tx5/pk2/w12/sim6), float policy, and
100 TB scale-shape notes live with the implementations; the original
staging-era discussion is in git history (this file at commit 78b0c51).
"""

from __future__ import annotations

from dataclasses import dataclass

from .packing import pk4_cdc_chunking
from .similarity import sim13_int8_quant_error
from .text import tx16_bigram_vocab_coverage
from .windows_sorts import w13_mad_anomaly


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
        ("tx16_bigram_vocab_coverage", tx16_bigram_vocab_coverage),
        ("pk4_cdc_chunking", pk4_cdc_chunking),
        ("w13_mad_anomaly", w13_mad_anomaly),
        ("sim13_int8_quant_error", sim13_int8_quant_error),
    ]
}
