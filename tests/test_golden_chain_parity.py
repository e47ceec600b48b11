"""Full feature-CHAIN golden parity against the reference's own wiring.

``tests/fixtures/golden_chain.json`` was produced by
``tools/gen_golden_chain.py`` executing the reference package's
functions in the exact ``compute_features`` wiring
(``ifcb_features/all.py:446-545``): find_blobs split/sort, per-blob
cov-form ellipse, explicit orientation, Heron convex hull of the
perimeter points, 360° Feret sweep, rotated-bbox widths, the U5 branch
rule with THOSE inputs, and the summed-over-blobs family.

:func:`roi_features_ref` must reproduce every value BIT-FOR-BIT on the
19-shape panel (589 pinned values) — including the near-threshold
branch shapes (ecc ≈ 0.8, area_ratio ≈ 1.2) where an
estimator-convention mismatch flips the biovolume branch, and the
multi-blob shapes where largest-blob vs whole-mask semantics diverge.
"""

from __future__ import annotations

import json
import math
import pathlib

import numpy as np
import pytest

from ifcb_data_pipeline_spark.operators.kernels import roi_features_ref

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "golden_chain.json"
GOLDEN = json.loads(FIXTURE.read_text())
CASES = {c["name"]: c for c in GOLDEN["cases"]}


def _mask(rows: list[str]) -> np.ndarray:
    return np.array([[c == "1" for c in row] for row in rows], dtype=bool)


@pytest.mark.parametrize("name", sorted(CASES))
def test_roi_features_match_reference_chain(name):
    case = CASES[name]
    ours = roi_features_ref(_mask(case["mask"]))
    for key, ref_v in case["chain"].items():
        got = ours[key]
        if key == "BiovolumeBranch":
            assert got == ref_v, (name, key)
            continue
        rv = float(ref_v)
        if math.isnan(rv):
            assert math.isnan(got), (name, key, got)
        else:
            assert got == rv, (name, key, f"ref={ref_v}", f"ours={got!r}")


def test_branch_shapes_cover_both_branches():
    branches = {c["chain"]["BiovolumeBranch"] for c in GOLDEN["cases"]}
    assert branches == {"sor", "distmap"}


def test_panel_covers_multi_blob_semantics():
    multi = [c for c in GOLDEN["cases"] if float(c["chain"]["numBlobs"]) > 1]
    assert multi, "panel lost its multi-blob cases"
    for c in multi:
        assert float(c["chain"]["summedArea"]) > float(c["chain"]["Area"])
