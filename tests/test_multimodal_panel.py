"""MM2 analytic-shape panel: pins the baked VALUES oracle to closed-form
geometry (VERDICT r3 item 2).

The mm2 oracle is a literal baked from the deterministic kernel chain;
these tests keep that literal honest by re-deriving the panel rows and
asserting they sit within analytic tolerance of the true geometry —
pi*r^2 / w*h areas, sphere/cylinder biovolumes, zero eccentricity on
rotationally-symmetric shapes.  A kernel regression therefore breaks
BOTH this file and the driver's hash gate, never one without the other.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from ifcb_data_pipeline_spark.queries.multimodal import (
    MM2_PANEL,
    MM2_SQL,
    MM2B_PANEL,
    MM2B_SQL,
    panel_mask,
)


def chain_features(kind: str, p1: int, p2: int) -> dict:
    # the production chain: segmentation + the compute_features-faithful
    # feature layer (roi_features_ref — reference-certified in
    # tests/test_golden_chain_parity.py) + the texture/symmetry extras
    from ifcb_data_pipeline_spark.operators.kernels import (
        roi_features_ref,
        segment_roi_pc,
        symmetry_features,
        texture_stats,
    )

    m = panel_mask(kind, p1, p2)
    img = np.full(m.shape, 215, dtype=np.uint8)
    img[m] = 45
    mask = segment_roi_pc(img)
    out = roi_features_ref(mask)
    out.update(texture_stats(img, mask))
    out.update(symmetry_features(mask))
    out["true_mask"] = m
    out["seg_mask"] = mask
    return out


def oracle_rows(sql: str = MM2_SQL) -> dict[str, tuple]:
    """Parse a VALUES literal back into {sample: row} via DuckDB."""
    import duckdb

    rel = duckdb.sql(sql)
    cols = rel.columns
    return {r[0]: dict(zip(cols, r)) for r in rel.fetchall()}


WELL_SEGMENTED = {
    # sample → (analytic area, analytic biovolume or None, ecc upper bound)
    "disk_r9": (math.pi * 81, 4 / 3 * math.pi * 9**3, 0.3),
    "disk_r12": (math.pi * 144, 4 / 3 * math.pi * 12**3, 0.3),
    "disk_r15": (math.pi * 225, 4 / 3 * math.pi * 15**3, 0.2),
    "rect_10x10": (100.0, math.pi / 4 * 10**2 * 10, 0.05),
    "ellipse_18x8": (math.pi * 18 * 8, None, None),
}


@pytest.mark.parametrize("sample", sorted(WELL_SEGMENTED))
def test_panel_matches_analytic_geometry(sample):
    spec = {s: (k, p1, p2) for s, k, p1, p2 in MM2_PANEL}
    kind, p1, p2 = spec[sample]
    feats = chain_features(kind, p1, p2)
    a_area, a_vol, ecc_hi = WELL_SEGMENTED[sample]
    assert feats["Area"] == pytest.approx(a_area, rel=0.08)
    if a_vol is not None:
        assert feats["Biovolume"] == pytest.approx(a_vol, rel=0.10)
    if ecc_hi is not None:
        assert feats["Eccentricity"] <= ecc_hi


def test_square_is_nearly_segmentation_exact():
    """10x10 square: the reference's exact segmentation (MATLAB-LUT
    thinning unioned with the k-means dark mask — round-17
    reference-certified in tests/test_golden_family_parity.py) leaves a
    few thin edge spurs beyond the true square, so the mask is a slight
    SUPERSET of the truth rather than equal to it."""
    feats = chain_features("rect", 10, 10)
    seg, true = feats["seg_mask"], feats["true_mask"]
    assert (seg & true).sum() == true.sum()  # no true pixel lost
    extra = int(seg.sum() - true.sum())
    assert 0 <= extra <= 8  # thinning spurs only
    assert feats["Area"] == float(seg.sum())


def test_baked_oracle_matches_live_chain():
    """EVERY baked float column equals a fresh driver-side run of the
    chain (rounded the same way) — the bake can never drift from the
    code.  Solidity/texture/summed/symmetry are anchored too (ADVICE
    r4): a regression in any exported kernel must break this pytest,
    not only the driver's hash gate."""
    rows = oracle_rows()
    assert len(rows) == len(MM2_PANEL)
    for sample, kind, p1, p2 in MM2_PANEL:
        feats = chain_features(kind, p1, p2)
        baked = rows[sample]
        for col in (
            "Area",
            "Perimeter",
            "Eccentricity",
            "Solidity",
            "texture_entropy",
            "Biovolume",
            "summedArea",
            "symmetry_b180",
        ):
            live = math.floor(feats[col] * 10000.0 + 0.5) / 10000.0
            assert float(baked[col]) == pytest.approx(live, abs=1e-9), (sample, col)
        assert baked["BiovolumeBranch"] == feats["BiovolumeBranch"]


def chain_summed(kind: str, p1: int, p2: int) -> dict:
    """chain_features already carries the U12 multi-blob outputs
    (roi_features_ref computes numBlobs + the summed family)."""
    return chain_features(kind, p1, p2)


def test_mm2b_pairs_segment_as_two_blobs():
    """The disjoint disk pairs must survive segmentation as TWO blobs —
    the multi-blob labeling path of U12 that MM2_PANEL never hits."""
    for kind, p1, p2 in (("pair", 7, 12), ("pair", 10, 16)):
        feats = chain_summed(kind, p1, p2)
        assert feats["numBlobs"] == 2, (kind, p1, p2)


def test_mm2b_plus_is_nonconvex():
    """Plus shapes: 4-fold symmetric but non-convex — Solidity must sit
    well below 1 (analytic: area/hull = 2wt-t^2 over the octagon hull),
    a regime the original panel's convex shapes never reach."""
    feats = chain_features("plus", 24, 8)
    assert feats["Solidity"] < 0.75
    assert feats["Eccentricity"] < 0.1  # 4-fold symmetry


def test_mm2b_baked_oracle_matches_live_chain():
    """Every mm2b literal row equals a fresh driver-side run of the
    chain, all float columns + branch + blob count — same contract as
    the mm2 bake."""
    rows = oracle_rows(MM2B_SQL)
    assert len(rows) == len(MM2B_PANEL)
    for sample, kind, p1, p2 in MM2B_PANEL:
        feats = chain_summed(kind, p1, p2)
        baked = rows[sample]
        for col in (
            "Area",
            "Perimeter",
            "Eccentricity",
            "Solidity",
            "texture_entropy",
            "Biovolume",
            "summedArea",
            "symmetry_b180",
        ):
            live = math.floor(feats[col] * 10000.0 + 0.5) / 10000.0
            assert float(baked[col]) == pytest.approx(live, abs=1e-9), (sample, col)
        assert baked["BiovolumeBranch"] == feats["BiovolumeBranch"]
        assert int(baked["numBlobs"]) == int(feats["numBlobs"])


# --- MM6 isotropy ----------------------------------------------------------
def chain_features_img(img: np.ndarray) -> dict:
    from ifcb_data_pipeline_spark.operators.kernels import (
        roi_features_ref,
        segment_roi_pc,
    )

    return roi_features_ref(segment_roi_pc(img))


@pytest.mark.parametrize("sample,kind,p1,p2", MM2_PANEL)
def test_mm6_isotropy(sample, kind, p1, p2):
    """The mm6 contract: the log-Gabor orientation set is closed under
    mirror and 90-degree rotation, so the geometry features of a flipped
    or rotated shape must match the original — exactly for the mirror
    (same canvas), and within ~2.5% for rot90 (the thinning LUT's
    raster order and the hysteresis frame trim are not exactly rot90-
    equivariant, so the segmentation differs by edge pixels; the band
    is the measured panel worst case, 2.14% Biovolume on ellipse_14x6
    under the r18 published-grid phasecong, plus headroom — the baked
    mm6 oracle records the exact values)."""
    m = panel_mask(kind, p1, p2)
    img = np.full(m.shape, 215, dtype=np.uint8)
    img[m] = 45
    base = chain_features_img(img)
    flip = chain_features_img(np.ascontiguousarray(img[:, ::-1]))
    rot = chain_features_img(np.ascontiguousarray(np.rot90(img)))
    for k in ("Area", "Perimeter", "Solidity", "Biovolume"):
        assert flip[k] == pytest.approx(base[k], rel=1e-9), f"flip {k}"
        assert rot[k] == pytest.approx(base[k], rel=0.025), f"rot90 {k}"
