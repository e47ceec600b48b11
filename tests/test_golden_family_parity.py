"""Golden REFERENCE-EXECUTION parity for the kernel families (round 17).

`tools/gen_golden_families.py` ran the reference's own modules
(`texture.py`, `hog.py`, `ringwedge.py`, `perimeter.py`,
`blob_geometry.py`, `segmentation.py`, `morphology.py` — see the
generator's trust notes) on a 10-image grayscale panel and recorded
every value.  The engine must reproduce all of them BIT-FOR-BIT:

- U1 segmentation masks (downstream of a shared phase-congruency map),
- U7 texture statistics (contrast-enhanced statxture),
- U9 HOG (the MATLAB-heritage 3×3-window signed-orientation form),
- U10 ring/wedge at the reference's 301 canvas,
- U8 invariant moments,
- U6 binary + modified-Hausdorff symmetry of the rotated largest blob,
- U4 PRNG pairwise perimeter statistics.

Reference wiring: `all.py:253-418`; kernels under
`/root/reference/code/python/ifcb-features/ifcb_features/`.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np
import pytest

from ifcb_data_pipeline_spark.operators import kernels as K

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "golden_families.json"
CASES = json.loads(FIXTURE.read_text())["cases"]


def _img(case) -> np.ndarray:
    return np.array(case["image"], dtype=np.uint8)


def _mask(rows) -> np.ndarray:
    return np.array([[c == "1" for c in row] for row in rows], dtype=bool)


def _ids(cases):
    return [c["name"] for c in cases]


@pytest.mark.parametrize("case", CASES, ids=_ids(CASES))
def test_segmentation_mask_parity(case):
    """segment_roi_pc == the reference's segment_roi (steps 2-8) given
    the same phase-congruency map — pixel-for-pixel."""
    ours = K.segment_roi_pc(_img(case))
    ref = _mask(case["mask"])
    assert np.array_equal(ours, ref), (
        f"{int((ours ^ ref).sum())} px differ"
    )


@pytest.mark.parametrize("case", CASES, ids=_ids(CASES))
def test_kmeans_dark_mask_parity(case):
    """Strict MATLAB-batch k-means dark thresholding, bit-for-bit."""
    ours = K.kmeans_dark_mask(_img(case))
    assert np.array_equal(ours, _mask(case["kmeans_mask"]))


@pytest.mark.parametrize("case", CASES, ids=_ids(CASES))
def test_texture_parity(case):
    tex = K.texture_stats(_img(case), _mask(case["mask"]))
    got = [
        tex[k]
        for k in (
            "texture_average_gray_level", "texture_average_contrast",
            "texture_smoothness", "texture_third_moment",
            "texture_uniformity", "texture_entropy",
        )
    ]
    assert [repr(float(v)) for v in got] == case["texture"]


@pytest.mark.parametrize("case", CASES, ids=_ids(CASES))
def test_hog_parity(case):
    got = K.hog_features(_img(case))
    assert [repr(float(v)) for v in got] == case["hog"]


@pytest.mark.parametrize("case", CASES, ids=_ids(CASES))
def test_ringwedge_parity(case):
    mask = _mask(case["mask"])
    if not mask.any():
        # the reference NEVER calls ring_wedge with num_blobs==0 — the
        # all.py:424-429 guard returns zeros, and the engine's wiring
        # (features_from_images' mask.any() gate) mirrors it; the
        # fixture records the guard's output.
        assert case["rw_power_integral"] == repr(0.0)
        assert case["rw_power_ratio"] == repr(0.0)
        assert case["wedges"] == [repr(0.0)] * 48
        assert case["rings"] == [repr(0.0)] * 50
        return
    rw = K.ringwedge_features(mask, size=301)
    assert repr(float(rw["RWhalfpowerintegral"])) == case["rw_power_integral"]
    assert repr(float(rw["RWcenter2total_powerratio"])) == case["rw_power_ratio"]
    assert [repr(float(v)) for v in rw["Wedge"]] == case["wedges"]
    assert [repr(float(v)) for v in rw["Ring"]] == case["rings"]


@pytest.mark.parametrize("case", CASES, ids=_ids(CASES))
def test_invmoments_parity(case):
    got = K.hu_moments(_mask(case["mask"]))
    assert [repr(float(v)) for v in got] == case["invmoments"]


@pytest.mark.parametrize("case", CASES, ids=_ids(CASES))
def test_symmetry_parity(case):
    sym = K.symmetry_features(_mask(case["mask"]))
    got_b = [sym["symmetry_b180"], sym["symmetry_b90"], sym["symmetry_bflip"]]
    got_h = [sym["symmetry_h180"], sym["symmetry_h90"], sym["symmetry_hflip"]]
    assert [repr(float(v)) for v in got_b] == case["binary_symmetry"]
    assert [repr(float(v)) for v in got_h] == case["hausdorff_symmetry"]


@pytest.mark.parametrize("case", CASES, ids=_ids(CASES))
def test_perimeter_pair_stats_parity(case):
    pst = K.perimeter_pair_stats(_mask(case["mask"]))
    got = [
        pst[k]
        for k in (
            "perimeter_mean", "perimeter_median",
            "perimeter_skewness", "perimeter_kurtosis",
        )
    ]
    assert [repr(float(v)) for v in got] == case["perimeter_stats"]


def test_panel_exercises_branches():
    """The panel is only as good as the paths it hits: multi-blob
    (largest-blob selection), non-square images (HOG window floors,
    zoom aspect), and a low-contrast case (k-means + prctile stretch)."""
    by_name = {c["name"]: c for c in CASES}
    pair = _mask(by_name["pair_blobs"]["mask"])
    assert len(K.find_blobs_sorted(pair)) >= 2
    shapes = {tuple(np.array(c["image"]).shape) for c in CASES}
    assert any(h != w for h, w in shapes)
    assert "dim_contrast" in by_name


def test_panel_exercises_degenerate_guards():
    """Round-18 hardening (VERDICT r17 #7): the num_blobs==0 guard
    branches are reference-executed, not assumed — exactly-flat fields
    (NaN phasecong + k-means singleton), a 1-px dot (smallest surviving
    segmentation), and a case whose mask is NON-empty before the
    min-blob-41 gate but empty after it."""
    by_name = {c["name"]: c for c in CASES}
    for nm in ("flat_all", "dark_all", "gate_killed"):
        assert not _mask(by_name[nm]["mask"]).any(), nm
        assert by_name[nm]["texture"] == [repr(0.0)] * 6, nm
        assert by_name[nm]["invmoments"] == [repr(0.0)] * 7, nm
        assert by_name[nm]["perimeter_stats"] == [repr(0.0)] * 4, nm
    # gate_killed is the load-bearing one: content EXISTS before the
    # gate (its k-means mask is non-empty) and dies at the gate.
    assert _mask(by_name["gate_killed"]["kmeans_mask"]).sum() > 0
    # dot_1px survives via the erosion-acceptance branch
    assert _mask(by_name["dot_1px"]["mask"]).sum() > 41
