"""Golden fixtures for the FULL blob-feature chain (round 16, part 2).

Part 1 (`gen_golden_kernels.py`) certified the U5/U11 kernel layer —
the distmap/SoR algorithms and the MATLAB-parity rotation — by running
the reference's own functions on fixed inputs.  This generator goes one
layer up: the *chain* the reference wires in
`code/python/ifcb-features/ifcb_features/all.py` — per blob:

  area            = largest 8-connected component's pixel count
                    (all.py:47-59)
  equiv_diameter  = sqrt(4*area/pi)                    (all.py:61-64)
  perimeter       = benkrid_perimeter(find_perimeter)  (all.py:66-68)
  convex hull     = hull of the perimeter points       (all.py:81-97)
  convex per/area = edge sum + Heron fan + per/2       (blob_geometry.py:149-171)
  ellipse props   = eig of np.cov of on-pixel coords   (blob_geometry.py:22-46)
  orientation     = explicit_orientation (MATLAB moments, degrees)
                                                       (blob_geometry.py:48-86)
  rotated image   = rotate_blob(image, orientation)    (all.py:164-170)
  branch          = area_ratio < 1.2 or (ecc < 0.8 and p > 0.8)
                                                       (all.py:225-233)
  biovolume       = SoR on rotated image, or distmap on the TIGHT CROP
                    of the largest component           (all.py:200-233)

The chain is replicated here by CALLING the reference's own functions
(loaded with the same scipy/skimage shims as part 1) in the wiring
all.py documents; regionprops-only properties (largest-component area,
tight crop) are computed with independent brute-force equivalents.

TRUST NOTE on the hull: scipy's qhull is absent, so ConvexHull is
shimmed with an exact integer monotone-chain (same vertex SET —
extreme points of integer coordinates are unique; collinear points
excluded like qhull).  The shim returns vertices in CCW order starting
from the lexicographic minimum; real qhull may start the cycle at a
different vertex, which permutes the float SUMMATION ORDER of the
Heron fan (last-ulp).  Everything else in the fixture is
order-independent of that choice.  Round 17 PINNED this degree of
freedom (tests/test_qhull_cycle_stability.py): across every cyclic
start on every panel hull the spread is ≤ 4 ulp, the U5 branch
decision never flips, and the lexmin start convention is asserted.

Run:  python tools/gen_golden_chain.py [--report]
Writes: tests/fixtures/golden_chain.json
--report also prints a divergence table: reference chain vs the
engine's current kernels on every panel shape.
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from gen_golden_kernels import ANGLES, _label_bruteforce, _load_ref, panel  # noqa: E402

OUT = (
    pathlib.Path(__file__).resolve().parent.parent
    / "tests"
    / "fixtures"
    / "golden_chain.json"
)


class _Hull2D:
    """Exact integer monotone-chain stand-in for scipy.spatial.ConvexHull:
    `.vertices` = indices of the extreme points in CCW order (collinear
    points excluded, like qhull's default)."""

    def __init__(self, P: np.ndarray):
        P = np.asarray(P)
        n = len(P)
        order = np.lexsort((P[:, 1], P[:, 0]))

        def cross(o, a, b):
            return int(
                (P[a, 0] - P[o, 0]) * (P[b, 1] - P[o, 1])
                - (P[a, 1] - P[o, 1]) * (P[b, 0] - P[o, 0])
            )

        lower: list[int] = []
        for idx in order:
            while len(lower) >= 2 and cross(lower[-2], lower[-1], idx) <= 0:
                lower.pop()
            lower.append(int(idx))
        upper: list[int] = []
        for idx in order[::-1]:
            while len(upper) >= 2 and cross(upper[-2], upper[-1], idx) <= 0:
                upper.pop()
            upper.append(int(idx))
        verts = lower[:-1] + upper[:-1]
        if len(verts) < 3:
            raise ValueError("degenerate hull (QhullError stand-in)")
        self.vertices = np.array(verts, dtype=np.intp)


def _largest_component_8(mask: np.ndarray) -> np.ndarray:
    labels, n = _label_bruteforce(mask)
    if n <= 1:
        return np.asarray(mask).astype(bool)
    counts = np.bincount(labels.ravel())
    counts[0] = 0
    return labels == counts.argmax()


def _tight_crop(mask: np.ndarray) -> np.ndarray:
    ys, xs = np.nonzero(mask)
    return mask[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1]


def _blob_features(mods, blob: np.ndarray) -> dict:
    """One blob's feature set per ``compute_features`` (all.py:497-521),
    executed with the reference's own functions on the CROPPED
    single-component mask (exactly what BlobFeatures receives from
    find_blobs)."""
    bg, bio, blobs, morph, per = (
        mods["blob_geometry"],
        mods["biovolume"],
        mods["blobs"],
        mods["morphology"],
        mods["perimeter"],
    )
    B = np.asarray(blob).astype(bool)
    area = int(B.sum())
    equiv_d = float(np.sqrt(4.0 * area / np.pi))
    perim_img = morph.find_perimeter(B)
    perimeter = float(per.benkrid_perimeter(perim_img))
    maj, mn, ecc, _ = bg.ellipse_properties(B)
    orientation = bg.explicit_orientation(B)
    # convex hull over perimeter points (all.py:81-97 incl. fallbacks)
    pp = np.where(perim_img)
    P = np.vstack(pp).T
    try:
        hull = P[_Hull2D(P).vertices]
        degenerate = np.linalg.matrix_rank(hull - hull[0]) < 2
    except ValueError:
        hull, degenerate = P, True
    if degenerate or hull.shape[0] < 3:
        convex_per, convex_area = perimeter, float(area)
        feret_min, feret_max = bg.feret_diameters(P.astype(np.float64))
    else:
        convex_per, convex_area = bg.convex_hull_properties(
            hull.astype(np.float64)
        )
        feret_min, feret_max = bg.feret_diameters(hull.astype(np.float64))
    # compute_features exports the cropped UNROTATED blob image shape
    # (all.py:36-40, 504-505) — NOT the rotated bbox (rotated_bbox
    # exists in the reference but is never exported).
    bb_h, bb_w = B.shape
    rotated = blobs.rotate_blob(B, orientation)
    area_ratio = float(convex_area) / area
    p = equiv_d / maj
    use_sor = area_ratio < 1.2 or (ecc < 0.8 and p > 0.8)
    if use_sor:
        vol, rep, sa = bio.sor_volume_surface_area(rotated)
        branch = "sor"
    else:
        vol, rep, sa = bio.distmap_volume_surface_area(B, perim_img)
        branch = "distmap"
    return {
        "Area": float(area),
        "Biovolume": float(vol),
        "BoundingBox_xwidth": float(bb_w),
        "BoundingBox_ywidth": float(bb_h),
        "ConvexArea": float(convex_area),
        "ConvexPerimeter": float(convex_per),
        "Eccentricity": float(ecc),
        "EquivDiameter": equiv_d,
        "Extent": float(area) / B.size,
        "MajorAxisLength": float(maj),
        "MinorAxisLength": float(mn),
        "Orientation": float(orientation),
        "Perimeter": perimeter,
        "RepresentativeWidth": float(rep),
        "Solidity": float(area) / float(convex_area),
        "SurfaceArea": float(sa),
        "maxFeretDiameter": float(feret_max),
        "minFeretDiameter": float(feret_min),
        "BiovolumeBranch": branch,
    }


def reference_chain(mods, mask: np.ndarray) -> dict:
    """``compute_features``' exported set (all.py:446-545): largest
    blob's features + numBlobs + summed family + zero→NaN ratios,
    with blobs split/sorted like ``find_blobs`` (blobs.py:13-30)."""
    blobs_mod = mods["blobs"]
    _, _, comps = blobs_mod.find_blobs(np.asarray(mask).astype(bool))
    feats = [_blob_features(mods, b) for b in comps]
    b0 = feats[0]

    def summed(key):
        return float(
            np.sum(
                np.array([f[key] for f in feats], dtype=np.float64),
                dtype=np.float64,
            )
        )

    def zero_to_nan(v):
        return float("nan") if v == 0 else v

    s_per = summed("Perimeter")
    s_cper = summed("ConvexPerimeter")
    out = {k: (v if isinstance(v, str) else repr(v)) for k, v in b0.items()}
    out.update(
        numBlobs=repr(float(len(feats))),
        summedArea=repr(summed("Area")),
        summedBiovolume=repr(summed("Biovolume")),
        summedConvexArea=repr(summed("ConvexArea")),
        summedConvexPerimeter=repr(s_cper),
        summedMajorAxisLength=repr(summed("MajorAxisLength")),
        summedMinorAxisLength=repr(summed("MinorAxisLength")),
        summedPerimeter=repr(s_per),
        summedSurfaceArea=repr(summed("SurfaceArea")),
        Area_over_PerimeterSquared=repr(
            zero_to_nan(b0["Area"] / b0["Perimeter"] ** 2 if b0["Perimeter"] else 0.0)
        ),
        Area_over_Perimeter=repr(
            zero_to_nan(b0["Area"] / b0["Perimeter"] if b0["Perimeter"] else 0.0)
        ),
        summedConvexPerimeter_over_Perimeter=repr(
            zero_to_nan(s_cper / s_per if s_per else 0.0)
        ),
    )
    return out


def extended_panel() -> dict[str, np.ndarray]:
    """Part-1 panel + shapes near the branch thresholds (area_ratio≈1.2,
    ecc≈0.8, p≈0.8) where an estimator-convention mismatch flips the
    branch."""
    shapes = dict(panel())
    yy, xx = np.mgrid[:60, :60]
    # mild concavity: notched disk (area_ratio just above/below 1.2)
    d2 = (xx - 30) ** 2 + (yy - 30) ** 2
    disk = d2 <= 400
    notch = (np.abs(yy - 30) <= 4) & (xx >= 30 + 8)
    shapes["notched_disk"] = (disk & ~notch).astype(np.uint8)
    notch2 = (np.abs(yy - 30) <= 7) & (xx >= 30 + 4)
    shapes["notched_disk_deep"] = (disk & ~notch2).astype(np.uint8)
    # ellipses with eccentricity straddling 0.8 (b/a = 0.6 -> ecc 0.8)
    for name, (a, b) in {
        "ellipse_ecc79": (20.0, 12.4),
        "ellipse_ecc80": (20.0, 12.0),
        "ellipse_ecc81": (20.0, 11.6),
    }.items():
        shapes[name] = (
            (((xx - 30) / a) ** 2 + ((yy - 30) / b) ** 2) <= 1
        ).astype(np.uint8)
    # tilted near-threshold ellipse (orientation path matters)
    th = np.radians(28.0)
    u = (xx - 30) * np.cos(th) + (yy - 30) * np.sin(th)
    v = -(xx - 30) * np.sin(th) + (yy - 30) * np.cos(th)
    shapes["ellipse_ecc80_t28"] = (((u / 20.0) ** 2 + (v / 12.0) ** 2) <= 1).astype(
        np.uint8
    )
    # clean multi-blob case (compute_features' largest-blob + summed
    # semantics): two disks + a bar, distinct sizes
    myy, mxx = np.mgrid[:50, :70]
    multi = np.zeros((50, 70), dtype=np.uint8)
    multi[(mxx - 16) ** 2 + (myy - 20) ** 2 <= 144] = 1
    multi[(mxx - 48) ** 2 + (myy - 28) ** 2 <= 64] = 1
    multi[5:9, 40:64] = 1
    shapes["multi_blob"] = multi
    # The reference chain itself is undefined on sub-2-pixel components
    # (np.cov of one point is NaN — all.py would crash); drop shapes
    # containing such specks (prng_blob) from the CHAIN panel.
    out = {}
    for name, m in shapes.items():
        labels, n = _label_bruteforce(m.astype(bool))
        if n == 0:
            continue
        counts = np.bincount(labels.ravel())[1:]
        if counts.min() >= 3:
            out[name] = m
    return out


def _install_extra_shims() -> None:
    """Shims for blob_geometry.py / perimeter.py module-level imports
    (beyond part 1's): qhull via the exact monotone chain, brute-force
    pairwise distances, textbook moment statistics.  regionprops /
    draw.polygon / draw.line are import-satisfying stubs — the chain
    never calls them."""
    import types

    def _pdist(A):
        A = np.asarray(A, dtype=np.float64)
        n = len(A)
        out = []
        for i in range(n):
            d = np.sqrt(((A[i + 1 :] - A[i]) ** 2).sum(axis=1))
            out.append(d)
        return np.concatenate(out) if out else np.zeros(0)

    def _cdist(A, B):
        A = np.asarray(A, dtype=np.float64)
        B = np.asarray(B, dtype=np.float64)
        return np.sqrt(((A[:, None, :] - B[None, :, :]) ** 2).sum(axis=2))

    class _KDTree:
        def __init__(self, data):
            self.data = np.asarray(data, dtype=np.float64)

        def query(self, pts, k=1):
            assert k == 1
            d = _cdist(np.asarray(pts, dtype=np.float64), self.data)
            return d.min(axis=1), d.argmin(axis=1)

    def _skew(a):
        a = np.asarray(a, dtype=np.float64)
        m = a.mean()
        m2 = ((a - m) ** 2).mean()
        m3 = ((a - m) ** 3).mean()
        return m3 / m2**1.5

    def _kurtosis(a, fisher=True):
        a = np.asarray(a, dtype=np.float64)
        m = a.mean()
        m2 = ((a - m) ** 2).mean()
        m4 = ((a - m) ** 4).mean()
        k = m4 / m2**2
        return k - 3 if fisher else k

    def _moment(a, k):
        a = np.asarray(a, dtype=np.float64)
        return ((a - a.mean()) ** k).mean()

    class _QhullError(Exception):
        pass

    def _ConvexHull(P):
        try:
            return _Hull2D(P)
        except ValueError as e:
            raise _QhullError(str(e))

    spatial = types.ModuleType("scipy.spatial")
    spatial.ConvexHull = _ConvexHull
    spatial.QhullError = _QhullError
    spatial.cKDTree = _KDTree
    dist = types.ModuleType("scipy.spatial.distance")
    dist.pdist = _pdist
    dist.cdist = _cdist
    spatial.distance = dist
    stats = types.ModuleType("scipy.stats")
    stats.skew = _skew
    stats.kurtosis = _kurtosis
    stats.moment = _moment
    qhull_mod = types.ModuleType("scipy.spatial.qhull")
    qhull_mod.QhullError = _QhullError
    draw = types.ModuleType("skimage.draw")
    draw.polygon = lambda *a, **k: (_ for _ in ()).throw(
        NotImplementedError("polygon shim not needed by the chain")
    )
    draw.line = draw.polygon
    measure = types.ModuleType("skimage.measure")
    measure.regionprops = lambda *a, **k: (_ for _ in ()).throw(
        NotImplementedError("regionprops shim not needed by the chain")
    )
    measure.label = _label_bruteforce
    # scipy.ndimage.convolve = correlate with the flipped kernel
    from gen_golden_kernels import _correlate_bruteforce

    def _convolve(B, S, mode="constant", cval=0.0):
        assert mode == "constant" and cval == 0.0
        S = np.asarray(S)[::-1, ::-1]
        return _correlate_bruteforce(B, S, mode=mode)

    sys.modules["scipy.ndimage"].convolve = _convolve

    for name, mod in [
        ("scipy.spatial", spatial),
        ("scipy.spatial.distance", dist),
        ("scipy.spatial.qhull", qhull_mod),
        ("scipy.stats", stats),
        ("skimage.draw", draw),
        ("skimage.measure", measure),
    ]:
        sys.modules[name] = mod
    sys.modules["scipy"].spatial = spatial
    sys.modules["scipy"].stats = stats
    sys.modules["skimage"].draw = draw
    sys.modules["skimage"].measure = measure


def main() -> None:
    mods = _load_ref()
    _install_extra_shims()
    # load perimeter.py too (benkrid + stats live there)
    import importlib.util

    REF_PKG = pathlib.Path(
        "/root/reference/code/python/ifcb-features/ifcb_features"
    )
    for name in ("blob_geometry", "perimeter"):
        spec = importlib.util.spec_from_file_location(
            f"ifcb_features_ref.{name}", REF_PKG / f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ifcb_features_ref.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod

    cases = []
    for name, mask in extended_panel().items():
        if int(mask.sum()) < 2:
            # the reference chain itself is undefined on sub-2-pixel
            # blobs (np.cov of one point is NaN); segmentation's
            # min-area gate means all.py never sees them
            continue
        chain = reference_chain(mods, mask)
        cases.append(
            {
                "name": name,
                "mask": [
                    "".join("1" if v else "0" for v in row)
                    for row in mask.astype(bool)
                ],
                "chain": chain,
            }
        )
    OUT.write_text(json.dumps({"cases": cases}, indent=1))
    print(f"wrote {OUT} ({len(cases)} cases)")

    if "--report" in sys.argv:
        sys.path.insert(
            0, str(pathlib.Path(__file__).resolve().parent.parent)
        )
        from ifcb_data_pipeline_spark.operators.kernels import roi_features_ref

        n_exact = 0
        n_vals = 0
        for case in cases:
            mask = np.array(
                [[c == "1" for c in row] for row in case["mask"]], dtype=bool
            )
            ours = roi_features_ref(mask)
            bad = []
            for key, ref_v in case["chain"].items():
                got = ours.get(key)
                if isinstance(ref_v, str) and not ref_v[0].isdigit() and not ref_v.startswith("-"):
                    ok = got == ref_v  # branch string
                else:
                    rv = float(ref_v)
                    ok = (got == rv) or (np.isnan(rv) and np.isnan(got))
                n_vals += 1
                n_exact += ok
                if not ok:
                    bad.append(f"{key}: ref={ref_v} ours={got!r}")
            status = "EXACT" if not bad else f"{len(bad)} diffs"
            print(f"{case['name']:22} {status}")
            for b in bad[:6]:
                print(f"    {b}")
        print(f"\n{n_exact}/{n_vals} values bit-exact")


if __name__ == "__main__":
    main()
