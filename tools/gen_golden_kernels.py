"""Generate golden parity fixtures for U5 (biovolume) / U11 (imrotate)
by RUNNING the reference's own Python kernels on a deterministic
synthetic ROI panel.

The reference checkout ships runnable implementations of the published
algorithms (`code/python/ifcb-features/ifcb_features/biovolume.py:56-158`,
`blobs.py:32-149`); this script executes them — it does not copy them —
and records their outputs so `tests/test_golden_kernel_parity.py` can
pin our independent implementations float-for-float.  This closes the
"self-certified analytic shapes only" gap the round-15 verdict flagged:
the one place the engine's numbers could silently diverge from the
reference's on real data (U5 feeds the A1 biovolume rollup, the
SURVEY's single most downstream-critical number).

The reference package imports scipy/skimage, which are absent in this
container.  We satisfy those imports with INDEPENDENT brute-force exact
primitives (O(N·M) Euclidean distance, border flood-fill, direct
correlation) — deliberately the dumbest correct implementations, so the
fixture's trust chain does not route through the engine's own optimized
kernels.  numpy 1.26 removed the ``np.bool`` alias the reference uses;
it is restored as ``bool`` for the duration of the import.

Run:  python tools/gen_golden_kernels.py
Writes: tests/fixtures/golden_kernels.json (committed; regeneration is
only needed if the panel changes).
"""

from __future__ import annotations

import importlib.util
import json
import pathlib
import sys
import types

import numpy as np

REF_PKG = pathlib.Path("/root/reference/code/python/ifcb-features/ifcb_features")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "golden_kernels.json"


# --- independent exact primitives (the scipy/skimage shims) -----------------

def _edt_bruteforce(inp: np.ndarray) -> np.ndarray:
    """Exact Euclidean distance from every nonzero pixel to the nearest
    zero pixel — O(pixels × zeros) pairwise minimum, no algorithmic
    cleverness shared with the engine's two-pass EDT."""
    a = np.asarray(inp) != 0
    h, w = a.shape
    zy, zx = np.nonzero(~a)
    out = np.zeros((h, w), dtype=np.float64)
    if zy.size == 0:
        # scipy: no zeros -> all distances are to a virtual infinite edge;
        # the panel never hits this (every mask has background).
        raise ValueError("panel mask has no background pixels")
    py, px = np.nonzero(a)
    if py.size:
        # chunk the pixel axis to bound memory
        for s in range(0, py.size, 2048):
            sy = py[s : s + 2048].astype(np.int64)
            sx = px[s : s + 2048].astype(np.int64)
            d2 = (sy[:, None] - zy[None, :]) ** 2 + (sx[:, None] - zx[None, :]) ** 2
            out[sy, sx] = np.sqrt(d2.min(axis=1).astype(np.float64))
    return out


def _fill_holes_bruteforce(x: np.ndarray) -> np.ndarray:
    """scipy.ndimage.binary_fill_holes with the default cross (4-conn)
    structure: background flood from the border; unreached background
    pixels are holes."""
    m = np.asarray(x).astype(bool)
    h, w = m.shape
    reach = np.zeros((h, w), dtype=bool)
    stack = [
        (y, x2)
        for y in range(h)
        for x2 in (0, w - 1)
        if not m[y, x2]
    ] + [
        (y2, x2)
        for y2 in (0, h - 1)
        for x2 in range(w)
        if not m[y2, x2]
    ]
    for y, x2 in stack:
        reach[y, x2] = True
    while stack:
        y, x2 = stack.pop()
        for ny, nx in ((y - 1, x2), (y + 1, x2), (y, x2 - 1), (y, x2 + 1)):
            if 0 <= ny < h and 0 <= nx < w and not m[ny, nx] and not reach[ny, nx]:
                reach[ny, nx] = True
                stack.append((ny, nx))
    return m | (~m & ~reach)


def _correlate_bruteforce(B: np.ndarray, S: np.ndarray, mode: str = "constant"):
    assert mode == "constant"
    B = np.asarray(B)
    kh, kw = np.asarray(S).shape
    ph, pw = kh // 2, kw // 2
    P = np.pad(B.astype(np.int64), ((ph, ph), (pw, pw)))
    h, w = B.shape
    out = np.zeros((h, w), dtype=np.int64)
    for dy in range(kh):
        for dx in range(kw):
            out += int(S[dy, dx]) * P[dy : dy + h, dx : dx + w]
    return out


def _label_bruteforce(B: np.ndarray, structure=None):
    """8-connected labeling via per-pixel BFS (structure is EIGHT at the
    reference's only call site)."""
    m = np.asarray(B).astype(bool)
    h, w = m.shape
    labels = np.zeros((h, w), dtype=np.int32)
    nxt = 0
    offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    for y in range(h):
        for x in range(w):
            if m[y, x] and labels[y, x] == 0:
                nxt += 1
                stack = [(y, x)]
                labels[y, x] = nxt
                while stack:
                    cy, cx = stack.pop()
                    for dy, dx in offs:
                        ny, nx2 = cy + dy, cx + dx
                        if 0 <= ny < h and 0 <= nx2 < w and m[ny, nx2] and labels[ny, nx2] == 0:
                            labels[ny, nx2] = nxt
                            stack.append((ny, nx2))
    return labels, nxt


def _find_objects_bruteforce(labeled: np.ndarray):
    n = int(labeled.max())
    out = []
    for i in range(1, n + 1):
        ys, xs = np.nonzero(labeled == i)
        out.append((slice(int(ys.min()), int(ys.max()) + 1), slice(int(xs.min()), int(xs.max()) + 1)))
    return out


def _disk(r: int) -> np.ndarray:
    yy, xx = np.mgrid[-r : r + 1, -r : r + 1]
    return ((xx * xx + yy * yy) <= r * r).astype(np.uint8)


def _binary_dilation_bruteforce(img: np.ndarray, footprint: np.ndarray) -> np.ndarray:
    m = np.asarray(img).astype(bool)
    fp = np.asarray(footprint).astype(bool)
    kh, kw = fp.shape
    ph, pw = kh // 2, kw // 2
    P = np.pad(m, ((ph, ph), (pw, pw)))
    h, w = m.shape
    out = np.zeros((h, w), dtype=bool)
    for dy in range(kh):
        for dx in range(kw):
            if fp[dy, dx]:
                out |= P[dy : dy + h, dx : dx + w]
    return out


def _install_shims() -> None:
    scipy = types.ModuleType("scipy")
    ndimage = types.ModuleType("scipy.ndimage")
    measurements = types.ModuleType("scipy.ndimage.measurements")
    ndimage.binary_fill_holes = _fill_holes_bruteforce
    ndimage.distance_transform_edt = _edt_bruteforce
    ndimage.correlate = _correlate_bruteforce
    ndimage.label = _label_bruteforce
    measurements.label = _label_bruteforce
    measurements.find_objects = _find_objects_bruteforce
    ndimage.measurements = measurements
    scipy.ndimage = ndimage
    skimage = types.ModuleType("skimage")
    morph = types.ModuleType("skimage.morphology")
    morph.disk = _disk
    morph.binary_dilation = _binary_dilation_bruteforce

    def _reconstruction(*a, **k):  # imported but unused by our calls
        raise NotImplementedError("reconstruction shim should not be called")

    morph.reconstruction = _reconstruction
    skimage.morphology = morph
    for name, mod in [
        ("scipy", scipy),
        ("scipy.ndimage", ndimage),
        ("scipy.ndimage.measurements", measurements),
        ("skimage", skimage),
        ("skimage.morphology", morph),
    ]:
        sys.modules[name] = mod
    if not hasattr(np, "bool"):
        np.bool = bool  # removed alias the reference package predates


def _load_ref():
    _install_shims()
    pkg = types.ModuleType("ifcb_features_ref")
    pkg.__path__ = [str(REF_PKG)]
    sys.modules["ifcb_features_ref"] = pkg
    mods = {}
    for name in ("morphology", "biovolume", "blobs", "random"):
        spec = importlib.util.spec_from_file_location(
            f"ifcb_features_ref.{name}", REF_PKG / f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ifcb_features_ref.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


# --- deterministic ROI panel -------------------------------------------------

def panel() -> dict[str, np.ndarray]:
    shapes: dict[str, np.ndarray] = {}
    yy, xx = np.mgrid[:64, :64]
    shapes["circle_r20"] = (((xx - 32) ** 2 + (yy - 32) ** 2) <= 400).astype(np.uint8)
    shapes["ellipse_axis"] = ((((xx - 32) / 28.0) ** 2 + ((yy - 32) / 9.0) ** 2) <= 1).astype(np.uint8)
    th = np.radians(35.0)
    u = (xx - 32) * np.cos(th) + (yy - 32) * np.sin(th)
    v = -(xx - 32) * np.sin(th) + (yy - 32) * np.cos(th)
    shapes["ellipse_35deg"] = (((u / 24.0) ** 2 + (v / 8.0) ** 2) <= 1).astype(np.uint8)
    d2 = (xx - 32) ** 2 + (yy - 32) ** 2
    shapes["annulus"] = ((d2 <= 400) & (d2 >= 100)).astype(np.uint8)
    crescent = (d2 <= 400) & (((xx - 40) ** 2 + (yy - 32) ** 2) >= 225)
    shapes["crescent"] = crescent.astype(np.uint8)
    bar = np.zeros((48, 48), dtype=np.uint8)
    for i in range(40):
        bar[4 + i // 2, 4 + i] = 1
        if 4 + i // 2 + 1 < 48:
            bar[4 + i // 2 + 1, 4 + i] = 1
    shapes["diag_bar"] = bar
    plus = np.zeros((41, 41), dtype=np.uint8)
    plus[17:24, 5:36] = 1
    plus[5:36, 17:24] = 1
    shapes["plus"] = plus
    one = np.zeros((9, 9), dtype=np.uint8)
    one[4, 4] = 1
    shapes["single_pixel"] = one
    sq = np.zeros((10, 10), dtype=np.uint8)
    sq[4:6, 4:6] = 1
    shapes["square_2x2"] = sq
    line = np.zeros((7, 36), dtype=np.uint8)
    line[3, 3:33] = 1
    shapes["hline_1x30"] = line
    rect = np.zeros((50, 50), dtype=np.uint8)
    rect[16:34, 5:45] = 1
    shapes["rect_40x18"] = rect
    # pseudo-random blob from the reference's own PRNG recurrence
    # (same stream MATLAB parity code uses — a published LCG)
    vals = np.zeros(30 * 30, dtype=np.int64)
    prev = 1
    for j in range(vals.size):
        vals[j] = (prev * 30203) % 29663
        prev = int(vals[j])
    noise = (vals % 100).reshape(30, 30, order="F")
    blob = (noise < 55).astype(np.uint8)
    blob[0, :] = 0
    blob[-1, :] = 0
    blob[:, 0] = 0
    blob[:, -1] = 0
    shapes["prng_blob"] = blob
    # two components joined only diagonally (connectivity semantics)
    dj = np.zeros((20, 20), dtype=np.uint8)
    dj[4:9, 4:9] = 1
    dj[9:14, 9:14] = 1
    shapes["diag_joined"] = dj
    star = ((np.abs(xx - 32) + np.abs(yy - 32)) <= 18) & (
        (np.abs(xx - 32) <= 6) | (np.abs(yy - 32) <= 6) | (d2 <= 144)
    )
    shapes["star"] = star.astype(np.uint8)
    return shapes


ANGLES = [0.0, 17.3, 35.0, -28.6, 45.0, 90.0, 122.5]


def main() -> None:
    mods = _load_ref()
    bio, blobs = mods["biovolume"], mods["blobs"]
    cases = []
    for name, mask in panel().items():
        b = mask.astype(bool)
        vol, x, sa = bio.distmap_volume_surface_area(b)
        sv, sx, ssa = bio.sor_volume_surface_area(b)
        rots = {}
        for ang in ANGLES:
            r = blobs.rotate_blob(b, ang)
            rots[str(ang)] = ["".join("1" if v else "0" for v in row) for row in r]
        cases.append(
            {
                "name": name,
                "mask": ["".join("1" if v else "0" for v in row) for row in mask.astype(bool)],
                "distmap": {"volume": repr(float(vol)), "x": repr(float(x)), "sa": repr(float(sa))},
                "sor": {"volume": repr(float(sv)), "xr": repr(float(sx)), "sa": repr(float(ssa))},
                "rotations": rots,
            }
        )
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps({"angles": ANGLES, "cases": cases}, indent=1))
    print(f"wrote {OUT} ({len(cases)} cases)")


if __name__ == "__main__":
    main()
