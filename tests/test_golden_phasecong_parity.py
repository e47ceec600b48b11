"""U1 step 1 anchor: the engine's phase congruency vs the published
algorithm (VERDICT r17 #2).

The reference pins phasepack's ``phasecong`` (Kovesi phasecong3
covariance path) with nscale=4 norient=6 minWl=2 mult=2.5 sigmaOnf=0.55
k=2 cutOff=0.3 g=5 noiseMethod=-1 and thresholds M+m for segmentation
(`/root/reference/code/python/ifcb-features/ifcb_features/phasecong.py:28-60`).
phasepack itself is absent from the checkout, so the anchor is an
independent second transcription of the PUBLISHED algorithm
(tools/gen_golden_phasecong.py) and its fixture
tests/fixtures/golden_phasecong.json — the engine must match it
BIT-FOR-BIT on the 20-image anchor panel (family panel + odd-dimension
crops + degenerate flat/near-flat/point images; odd dims are
load-bearing: the published filtergrid divides odd axes by n-1, the
pre-r18 engine divided by n and flipped 1-12 hysteresis mask pixels per
odd image).

The residual trust radius — spots where the published text itself is
ulp-ambiguous (two readings of the same line round differently) — is
MEASURED here, not assumed, the same way the qhull cycle note was
closed: every ambiguity variant must produce ZERO hysteresis-mask flips
at both reference thresholds and values within 1e-14 of the anchor
(measured spread ~2e-15 across the panel).
"""

from __future__ import annotations

import hashlib
import json
import math
import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ifcb_data_pipeline_spark.operators.phasecong import phase_congruency_Mm  # noqa: E402

FIXTURE = REPO / "tests" / "fixtures" / "golden_phasecong.json"


@pytest.fixture(scope="module")
def fixture():
    return json.loads(FIXTURE.read_text())


@pytest.fixture(scope="module")
def images():
    from tools.gen_golden_phasecong import anchor_images

    return anchor_images()


def test_panel_is_complete(fixture, images):
    assert set(fixture["images"]) == set(images)
    # the load-bearing cases must be present
    names = set(images)
    assert {n for n in names if n.startswith("odd_")} == {
        "odd_both_disk",
        "odd_rows_rect",
        "odd_cols_ellipse",
        "odd_small_pair",
    }
    assert {"flat_mid", "near_flat_1px", "dark_point"} <= names
    # odd-dim cases really are odd-dimensioned
    for n in ("odd_both_disk", "odd_rows_rect", "odd_cols_ellipse"):
        h, w = images[n].shape
        assert h % 2 or w % 2, (n, h, w)


def test_engine_matches_published_bit_for_bit(fixture, images):
    for name, img in images.items():
        want = fixture["images"][name]
        mm = phase_congruency_Mm(img)
        got_md5 = hashlib.md5(
            np.ascontiguousarray(np.asarray(mm, dtype=np.float64)).tobytes()
        ).hexdigest()
        assert got_md5 == want["md5"], f"{name}: M+m map diverged from published form"
        # mask-level digests at the reference hysteresis thresholds
        for thr, key in ((0.3, "mask_gt_030_md5"), (0.09, "mask_gt_009_md5")):
            m_md5 = hashlib.md5(np.ascontiguousarray(mm > thr).tobytes()).hexdigest()
            assert m_md5 == want[key], f"{name}: mask@{thr} diverged"
        assert int((~np.isfinite(mm)).sum()) == want["nan_count"], name


def test_probe_values_exact(fixture, images):
    """Value-level spot check (readable failure if the md5 gate trips)."""
    for name in ("disk_textured", "odd_both_disk", "flat_mid", "dark_point"):
        want = fixture["images"][name]
        mm = phase_congruency_Mm(images[name])
        for yi, y in enumerate(want["probe_rows"]):
            for xi, x in enumerate(want["probe_cols"]):
                w = want["probe"][yi][xi]
                g = float(mm[y, x])
                if isinstance(w, str):  # non-finite, serialized as repr
                    assert not math.isfinite(g), (name, y, x, g)
                else:
                    assert g == w, (name, y, x, g, w)


def test_flat_image_nan_semantics():
    """Published bare 0/0 division: an exactly-flat image yields an
    all-NaN map whose thresholded masks are empty — the behavior the
    downstream segmentation relies on."""
    mm = phase_congruency_Mm(np.full((40, 40), 128, dtype=np.uint8))
    assert np.isnan(mm).all()
    with np.errstate(invalid="ignore"):
        assert not (mm > 0.09).any() and not (mm > 0.3).any()


ULP_AMBIGUITY_VARIANTS = [
    "filter_assoc_left",  # (IM*lg)*spread vs IM*(lg*spread)
    "hypot",  # hypot vs sqrt(x^2+y^2) for radius and XEnergy
    "mathlog_sigma",  # libm- vs numpy-rounded log(sigmaOnf) constant
    "covxy_mul",  # covxy*(4/norient) vs (4*covxy)/norient
]


@pytest.mark.parametrize("vname", ULP_AMBIGUITY_VARIANTS)
def test_published_ambiguity_trust_radius(vname, images):
    """The published text's ulp freedom, measured (qhull-note recipe):
    each legitimate alternative reading must flip ZERO hysteresis mask
    pixels at both thresholds and stay within 1e-14 of the anchor on
    every panel image (observed spread ~2e-15)."""
    from tools.gen_golden_phasecong import phasecong_published

    worst = 0.0
    for name, img in images.items():
        base = phasecong_published(img)
        alt = phasecong_published(img, {vname: True})
        finite = np.isfinite(base) & np.isfinite(alt)
        assert (np.isfinite(base) == np.isfinite(alt)).all(), name
        if finite.any():
            worst = max(worst, float(np.abs((alt - base)[finite]).max()))
        with np.errstate(invalid="ignore"):
            for thr in (0.3, 0.09):
                flips = int(((alt > thr) != (base > thr)).sum())
                assert flips == 0, (vname, name, thr, flips)
    assert worst <= 1e-14, (vname, worst)
