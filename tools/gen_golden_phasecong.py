"""Second-source anchor for U1 step 1: phase congruency (VERDICT r17 #2).

The reference's own ``phasecong.py`` is a thin wrapper — ``from
phasepack import phasecong`` with ``covariance_only=True``
(`/root/reference/code/python/ifcb-features/ifcb_features/phasecong.py:28-45`)
— so the actual PC computation lives in an external public package that
is ABSENT from the checkout and cannot be reference-executed from it.
The algorithm itself is published public knowledge: P. Kovesi,
``phasecong3.m`` (csse.uwa.edu.au/~pk/research/matlabfns), "Image
Features from Phase Congruency" (Videre 1(3), 1999), and the Muldal
``phasepack`` Python translation of it (MIT).  ``covariance_only=True``
only skips the unused per-orientation PC / EO outputs; the (M, m)
covariance-moment math is phasecong3's, unchanged.

This tool is therefore an INDEPENDENT second implementation transcribed
from the PUBLISHED algorithm text — every equation, constant, epsilon
placement and accumulation form follows phasecong3.m / phasepack's
phasecong exactly (see per-step citations inline) — used to certify the
engine's ``operators/phasecong.py`` the same way the golden-kernel
fixtures certify U2-U12: generate ``tests/fixtures/golden_phasecong.json``
holding the published-form M+m maps (md5 of the float64 bytes + probe
values + mask-level digests) over the family panel PLUS odd-dimension
and degenerate extensions, and let
``tests/test_golden_phasecong_parity.py`` pin the engine against it.

Published-form points where a naive implementation could diverge (each
was checked against the published text):

* frequency grid (filtergrid.m / phasepack ``filtergrid``): for an ODD
  axis length n the range is ``[-(n-1)/2 .. (n-1)/2] / (n-1)`` — the
  divisor is n-1, NOT n; for EVEN n it is ``[-n/2 .. n/2-1] / n``.
* radius is ``sqrt(x^2 + y^2)`` (not hypot — same values to the last
  ulp or 1 off; we measure, see ULP note in the fixture).
* ``theta = atan2(-y, x)``; radius[0,0]=1 before the log.
* lowpassfilter(0.45, order 15) multiplies each log-Gabor; the DC bin
  of each log-Gabor is zeroed AFTER the lowpass.
* noiseMethod=-1: ``tau = median(sumAn at scale 0)/sqrt(log(4))``.
* ``XEnergy = sqrt(sumE^2 + sumO^2) + eps`` with eps=1e-4.
* PC_o = ``weight * Energy / sumAn`` — the published division is BARE
  (no epsilon): an exactly-flat image yields 0/0 = NaN maps, which the
  downstream ``Mm > threshold`` hysteresis treats as False (empty
  mask) — same mask as any guarded form.
* covariance normalization: ``covx2 /= norient/2``, ``covxy = 4*covxy/
  norient`` (that literal association), ``denom = sqrt(covxy^2 +
  (covx2-covy2)^2) + eps``, M,m = (covy2+covx2 ± denom)/2.

Run:  python tools/gen_golden_phasecong.py [--check] [--compare]
  --compare prints per-image engine-vs-published divergence stats
  (max |Δ|, max ulp distance, hysteresis mask flips at both
  thresholds) without writing the fixture.
"""

from __future__ import annotations

import hashlib
import json
import math
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FIXTURE = REPO / "tests" / "fixtures" / "golden_phasecong.json"

# Published parameter set (the reference wrapper's pinned values).
NSCALE = 4
NORIENT = 6
MIN_WAVELENGTH = 2
MULT = 2.5
SIGMA_ONF = 0.55
K = 2.0
CUTOFF = 0.3
G = 5.0
EPS = 1e-4  # Kovesi's epsilon


# --- published-form building blocks (phasecong3.m / phasepack) --------------

def _published_axis(n: int) -> np.ndarray:
    """filtergrid.m range: odd n -> [-(n-1)/2 .. (n-1)/2]/(n-1);
    even n -> [-n/2 .. n/2-1]/n.  The odd divisor is n-1."""
    if n % 2:
        return np.arange(-(n - 1) / 2.0, (n - 1) / 2.0 + 1.0) / float(n - 1)
    return np.arange(-n / 2.0, n / 2.0) / float(n)


def _filtergrid(rows: int, cols: int):
    x, y = np.meshgrid(_published_axis(cols), _published_axis(rows))
    x = np.fft.ifftshift(x)
    y = np.fft.ifftshift(y)
    radius = np.sqrt(x * x + y * y)  # published sqrt form, not hypot
    return radius, x, y


def _lowpassfilter(rows: int, cols: int, cutoff: float = 0.45, n: int = 15):
    """lowpassfilter.m: Butterworth 1/(1+(r/cutoff)^(2n)) on the same
    odd/even grid convention; value 1 at DC (no radius[0,0] fix)."""
    radius, _, _ = _filtergrid(rows, cols)
    return 1.0 / (1.0 + (radius / cutoff) ** (2 * n))


def phasecong_published(img: np.ndarray, variant: dict | None = None) -> np.ndarray:
    """M + m of phasecong3.m's covariance path, transcribed from the
    published algorithm (independent of the engine's implementation).

    ``variant`` toggles the published text's ulp-ambiguous spots — the
    places where phasecong3.m's MATLAB and phasepack's numpy (or two
    readings of the same line) could legitimately round differently.
    Used by the sensitivity leg of test_golden_phasecong_parity to
    MEASURE the trust radius instead of assuming it (the qhull-note
    recipe):
      filter_assoc_left: EO = ifft2((IM*lg)*spread) instead of
        ifft2(IM*(lg*spread))
      hypot: XEnergy and radius via np.hypot instead of sqrt(x^2+y^2)
      mathlog_sigma: the 2*log(sigmaOnf)^2 constant via math.log (the
        correctly-rounded libm value, 1 ulp off np.log)
      covxy_mul: covxy * (4.0/norient) instead of (4.0*covxy)/norient
    """
    v = variant or {}
    img = np.asarray(img)
    if img.dtype not in (np.float32, np.float64):
        img = img.astype(np.float64)
    rows, cols = img.shape
    IM = np.fft.fft2(img)

    radius, fx, fy = _filtergrid(rows, cols)
    if v.get("hypot"):
        radius = np.hypot(fx, fy)
    radius[0, 0] = 1.0
    theta = np.arctan2(-fy, fx)
    sintheta = np.sin(theta)
    costheta = np.cos(theta)
    lp = _lowpassfilter(rows, cols)

    log_gabor = []
    for ss in range(NSCALE):
        wavelength = MIN_WAVELENGTH * MULT**ss
        fo = 1.0 / wavelength
        if v.get("mathlog_sigma"):
            denom_const = 2.0 * math.log(SIGMA_ONF) ** 2
        else:
            denom_const = 2.0 * np.log(SIGMA_ONF) ** 2
        lg = np.exp((-((np.log(radius / fo)) ** 2)) / denom_const)
        lg = lg * lp
        lg[0, 0] = 0.0
        log_gabor.append(lg)

    covx2 = np.zeros((rows, cols))
    covy2 = np.zeros((rows, cols))
    covxy = np.zeros((rows, cols))

    for o in range(NORIENT):
        angl = o * np.pi / NORIENT  # published left-to-right association
        ds = sintheta * np.cos(angl) - costheta * np.sin(angl)
        dc = costheta * np.cos(angl) + sintheta * np.sin(angl)
        dtheta = np.abs(np.arctan2(ds, dc))
        dtheta = np.minimum(dtheta * NORIENT / 2.0, np.pi)
        spread = (np.cos(dtheta) + 1.0) / 2.0

        sumE = np.zeros((rows, cols))
        sumO = np.zeros((rows, cols))
        sumAn = np.zeros((rows, cols))
        maxAn = np.zeros((rows, cols))
        EO_list = []
        tau = 0.0
        for ss in range(NSCALE):
            if v.get("filter_assoc_left"):
                EO = np.fft.ifft2((IM * log_gabor[ss]) * spread)
            else:
                EO = np.fft.ifft2(IM * (log_gabor[ss] * spread))
            EO_list.append(EO)
            An = np.abs(EO)
            sumAn = sumAn + An
            sumE = sumE + np.real(EO)
            sumO = sumO + np.imag(EO)
            if ss == 0:
                # noiseMethod == -1: median(sumAn) at the smallest scale
                tau = np.median(sumAn) / np.sqrt(np.log(4.0))
                maxAn = An
            else:
                maxAn = np.maximum(maxAn, An)

        if v.get("hypot"):
            XEnergy = np.hypot(sumE, sumO) + EPS
        else:
            XEnergy = np.sqrt(sumE**2 + sumO**2) + EPS
        MeanE = sumE / XEnergy
        MeanO = sumO / XEnergy
        Energy = np.zeros((rows, cols))
        for EO in EO_list:
            E = np.real(EO)
            O = np.imag(EO)
            Energy = Energy + (E * MeanE + O * MeanO - np.abs(E * MeanO - O * MeanE))

        totalTau = tau * (1.0 - (1.0 / MULT) ** NSCALE) / (1.0 - (1.0 / MULT))
        EstNoiseEnergyMean = totalTau * np.sqrt(np.pi / 2.0)
        EstNoiseEnergySigma = totalTau * np.sqrt((4.0 - np.pi) / 2.0)
        T = EstNoiseEnergyMean + K * EstNoiseEnergySigma
        Energy = np.maximum(Energy - T, 0.0)

        width = (sumAn / (maxAn + EPS) - 1.0) / (NSCALE - 1)
        weight = 1.0 / (1.0 + np.exp((CUTOFF - width) * G))

        # Published division is BARE sumAn (0/0 -> NaN on exactly-flat
        # input; NaN fails every > threshold downstream).
        with np.errstate(invalid="ignore", divide="ignore"):
            PCo = weight * Energy / sumAn

        covx = PCo * np.cos(angl)
        covy = PCo * np.sin(angl)
        covx2 = covx2 + covx**2
        covy2 = covy2 + covy**2
        covxy = covxy + covx * covy

    covx2 = covx2 / (NORIENT / 2.0)
    covy2 = covy2 / (NORIENT / 2.0)
    if v.get("covxy_mul"):
        covxy = covxy * (4.0 / NORIENT)
    else:
        covxy = 4.0 * covxy / NORIENT  # published association: (4*covxy)/norient
    denom = np.sqrt(covxy**2 + (covx2 - covy2) ** 2) + EPS
    M = (covy2 + covx2 + denom) / 2.0
    m = (covy2 + covx2 - denom) / 2.0
    return M + m


# --- panel -------------------------------------------------------------------

def anchor_images() -> dict[str, np.ndarray]:
    """The 13 family-panel images (even dims) + odd-dimension and
    degenerate extensions: the published grid convention differs for
    odd axes (divisor n-1 vs n), so odd dims are the load-bearing
    cases; flat/1px exercise the NaN/guard branches."""
    from tools.gen_golden_families import panel_images

    out = dict(panel_images())

    # odd-dimension variants: crop one row/col off textured panels so
    # both axes and the mixed cases are covered.
    out["odd_both_disk"] = out["disk_textured"][:63, :63]
    out["odd_rows_rect"] = out["rect_textured"][:47, :]
    out["odd_cols_ellipse"] = out["ellipse_axis"][:, :71]
    out["odd_small_pair"] = out["pair_blobs"][:59, :95]

    # degenerate: exactly flat (0/0 -> NaN in the published form),
    # near-flat (1-px contrast), and a 1-px bright point.
    out["flat_mid"] = np.full((40, 40), 128, dtype=np.uint8)
    near = np.full((41, 41), 128, dtype=np.uint8)
    near[20, 20] = 129
    out["near_flat_1px"] = near
    point = np.full((33, 47), 200, dtype=np.uint8)
    point[16, 23] = 20
    out["dark_point"] = point
    return out


# --- digests ------------------------------------------------------------------

def _probe_indices(h: int, w: int):
    ys = sorted({0, 1, h // 4, h // 2, (3 * h) // 4, h - 2, h - 1})
    xs = sorted({0, 1, w // 4, w // 2, (3 * w) // 4, w - 2, w - 1})
    return ys, xs


def digest(mm: np.ndarray) -> dict:
    mm = np.asarray(mm, dtype=np.float64)
    h, w = mm.shape
    ys, xs = _probe_indices(h, w)
    finite = np.isfinite(mm)
    masked = np.where(finite, mm, 0.0)
    return {
        "shape": [h, w],
        "md5": hashlib.md5(np.ascontiguousarray(mm).tobytes()).hexdigest(),
        "nan_count": int((~finite).sum()),
        "sum": float(masked.sum()),
        "max": float(masked.max()),
        "probe_rows": ys,
        "probe_cols": xs,
        # non-finite probes as strings: float NaN breaks JSON round-trip
        # equality (NaN != NaN) in --check and in the parity test
        "probe": [
            [
                float(mm[y, x]) if math.isfinite(mm[y, x]) else repr(float(mm[y, x]))
                for x in xs
            ]
            for y in ys
        ],
        # mask-level digests at the reference's hysteresis thresholds
        "mask_gt_030_md5": hashlib.md5(
            np.ascontiguousarray(mm > 0.3).tobytes()
        ).hexdigest(),
        "mask_gt_009_md5": hashlib.md5(
            np.ascontiguousarray(mm > 0.09).tobytes()
        ).hexdigest(),
        "mask_gt_030_count": int((mm > 0.3).sum()),
        "mask_gt_009_count": int((mm > 0.09).sum()),
    }


def _ulp_distance(a: np.ndarray, b: np.ndarray) -> int:
    """Max reinterpret-as-int64 step distance between two float64 maps
    (NaNs must coincide)."""
    ia = a.view(np.int64).copy()
    ib = b.view(np.int64).copy()
    # map negatives to a monotone integer line
    ia = np.where(ia < 0, np.int64(-(2**63) + 1) - ia, ia)
    ib = np.where(ib < 0, np.int64(-(2**63) + 1) - ib, ib)
    both = np.isfinite(a) & np.isfinite(b)
    if not both.any():
        return 0
    return int(np.abs(ia[both] - ib[both]).max())


def compare() -> int:
    from ifcb_data_pipeline_spark.operators.phasecong import phase_congruency_Mm

    bad = 0
    for name, img in anchor_images().items():
        pub = phasecong_published(img)
        eng = phase_congruency_Mm(img)
        nan_pub = ~np.isfinite(pub)
        nan_eng = ~np.isfinite(eng)
        both = ~nan_pub & ~nan_eng
        diff = np.abs(np.where(both, pub - eng, 0.0))
        flips_030 = int(((pub > 0.3) != (eng > 0.3)).sum())
        flips_009 = int(((pub > 0.09) != (eng > 0.09)).sum())
        ulp = _ulp_distance(pub, eng)
        exact = diff.max() == 0.0 and (nan_pub == nan_eng).all()
        status = "EXACT" if exact else f"maxdiff={diff.max():.3e} ulp={ulp}"
        print(
            f"{name:18s} {status:30s} nan(pub/eng)={nan_pub.sum()}/{nan_eng.sum()}"
            f" flips@0.3={flips_030} flips@0.09={flips_009}"
        )
        if flips_030 or flips_009 or (nan_pub != nan_eng).any():
            bad += 1
    return bad


def main() -> int:
    if "--compare" in sys.argv:
        return compare()
    out = {
        "_note": (
            "Published-form phase congruency (Kovesi phasecong3 covariance "
            "path, the algorithm phasepack's phasecong implements; the "
            "reference wrapper pins nscale=4 norient=6 minWl=2 mult=2.5 "
            "sigmaOnf=0.55 k=2 cutOff=0.3 g=5 noiseMethod=-1 and returns "
            "M+m).  Generated by tools/gen_golden_phasecong.py's "
            "independent transcription of the published equations; "
            "fixture digests are md5 over float64 bytes plus probe values "
            "and hysteresis-mask digests at the reference thresholds."
        ),
        "images": {},
    }
    for name, img in anchor_images().items():
        out["images"][name] = digest(phasecong_published(img))
    if "--check" in sys.argv:
        old = json.loads(FIXTURE.read_text())
        ok = old == out
        print("fixture", "MATCHES regeneration" if ok else "DIFFERS")
        return 0 if ok else 1
    FIXTURE.write_text(json.dumps(out, indent=1, sort_keys=True))
    print(f"wrote {FIXTURE} ({len(out['images'])} images)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
