"""Phase congruency (Kovesi) in pure numpy — the U1 edge detector.

Original implementation of the published algorithm (P. Kovesi, "Image
Features from Phase Congruency", Videre 1(3), 1999; "Phase Congruency
Detects Corners and Edges", DICTA 2003; the ``phasecong3.m`` covariance
path that the public ``phasepack`` package translates): a log-Gabor
filter bank over ``nscale`` scales × ``norient`` orientations in the
frequency domain, per-orientation phase-deviation energy with Rayleigh
noise compensation and frequency-spread weighting, accumulated into the
orientation-covariance moments.  Returns ``M + m`` (max + min moment),
the quantity the reference thresholds for segmentation
(``phasecong.py:41-60``: nscale=4, norient=6, minWaveLength=2,
mult=2.5, sigmaOnf=0.55, k=2, cutOff=0.3, g=5, noiseMethod=-1).

Round 18: anchored bit-for-bit against the independent published-form
transcription in ``tools/gen_golden_phasecong.py`` (fixture
``tests/fixtures/golden_phasecong.json``; parity pytest
``tests/test_golden_phasecong_parity.py``).  That anchoring adopted the
published forms at four points where this file previously deviated:

* frequency grid: an ODD axis of length n spans ``[-(n-1)/2 ..
  (n-1)/2] / (n-1)`` — divisor n-1, NOT n (filtergrid.m convention;
  the old /n grid shifted every odd-dimension mask, 1-12 hysteresis
  flips per panel image);
* ``radius`` and ``XEnergy`` use the published ``sqrt(x^2+y^2)`` form
  (``np.hypot`` differs in the last ulp);
* the per-orientation PC division is BARE ``weight*Energy/sumAn`` (no
  epsilon) — an exactly-flat image yields 0/0 = NaN, which every
  downstream ``> threshold`` treats as False (empty mask), matching
  the published behavior; the old ``+1e-4`` denominator shifted every
  pixel by ~1e-5 systematically;
* covariance normalization uses the published association
  ``(4*covxy)/norient``.

Deterministic, float64, no dependencies beyond numpy's FFT.
"""

from __future__ import annotations

import math

import numpy as np

# Reference parameter set (phasecong.py:33-41).
NSCALE = 4
NORIENT = 6
MIN_WAVELENGTH = 2
MULT = 2.5
SIGMA_ONF = 0.55
K_NOISE = 2.0
CUTOFF = 0.3
G_SHARPNESS = 5.0

_EPS = 1e-4  # Kovesi's epsilon guarding divisions


def _frequency_grids(rows: int, cols: int) -> tuple[np.ndarray, np.ndarray]:
    """Normalized centered frequency coordinates, ifftshifted so index
    (0,0) is DC — the published filtergrid convention: odd axes divide
    by n-1 (range exactly ±0.5), even axes by n."""

    def axis(n: int) -> np.ndarray:
        if n % 2:
            return np.arange(-(n - 1) / 2.0, (n - 1) / 2.0 + 1.0) / float(n - 1)
        return np.arange(-n / 2.0, n / 2.0) / float(n)

    x = np.fft.ifftshift(axis(cols))
    y = np.fft.ifftshift(axis(rows))
    return np.meshgrid(x, y)


def _log_gabor_bank(rows: int, cols: int) -> tuple[list[np.ndarray], np.ndarray, np.ndarray]:
    ux, uy = _frequency_grids(rows, cols)
    radius = np.sqrt(ux * ux + uy * uy)  # published sqrt form
    radius[0, 0] = 1.0  # avoid log(0) at DC; filter value there is zeroed
    theta = np.arctan2(-uy, ux)
    # Butterworth-style lowpass keeping the filters bounded at Nyquist
    # (Kovesi's lowpassfilter with cutoff 0.45, order 15; its value at
    # the DC bin is irrelevant — each log-Gabor's DC is forced to 0).
    lowpass = 1.0 / (1.0 + (radius / 0.45) ** 30)
    bank = []
    # np.log, not math.log: numpy's scalar log of 0.55 is 1 ulp off the
    # correctly-rounded libm value, and phasepack's published text uses
    # np.log — the fixture pins that operational choice (the 1-ulp
    # constant freedom is measured in test_golden_phasecong_parity).
    log_sigma = float(np.log(SIGMA_ONF)) ** 2
    for s in range(NSCALE):
        f0 = 1.0 / (MIN_WAVELENGTH * MULT**s)
        lg = np.exp(-(np.log(radius / f0) ** 2) / (2.0 * log_sigma)) * lowpass
        lg[0, 0] = 0.0
        bank.append(lg)
    return bank, np.sin(theta), np.cos(theta)


def phase_congruency_Mm(img: np.ndarray) -> np.ndarray:
    """``M + m`` covariance-moment phase congruency of a 2-D image."""
    img = np.asarray(img, dtype=np.float64)
    rows, cols = img.shape
    im_fft = np.fft.fft2(img)
    bank, sin_t, cos_t = _log_gabor_bank(rows, cols)

    covx2 = np.zeros((rows, cols))
    covy2 = np.zeros((rows, cols))
    covxy = np.zeros((rows, cols))

    for o in range(NORIENT):
        angle = o * math.pi / NORIENT
        # Angular distance on the half-circle, stretched so the spread
        # falls to zero at the neighboring orientation.
        ds = sin_t * math.cos(angle) - cos_t * math.sin(angle)
        dc = cos_t * math.cos(angle) + sin_t * math.sin(angle)
        dtheta = np.minimum(np.abs(np.arctan2(ds, dc)) * NORIENT / 2.0, math.pi)
        spread = (np.cos(dtheta) + 1.0) / 2.0

        sum_e = np.zeros((rows, cols))
        sum_o = np.zeros((rows, cols))
        sum_amp = np.zeros((rows, cols))
        max_amp = np.zeros((rows, cols))
        even_odd: list[np.ndarray] = []
        tau = 0.0
        for s in range(NSCALE):
            # published association: the bank filter is combined with
            # the orientation spread BEFORE multiplying the spectrum.
            response = np.fft.ifft2(im_fft * (bank[s] * spread))
            even_odd.append(response)
            amp = np.abs(response)
            sum_amp += amp
            sum_e += response.real
            sum_o += response.imag
            if s == 0:
                # noiseMethod=-1: Rayleigh noise estimated from the
                # median amplitude of the smallest-scale response.
                tau = float(np.median(amp)) / math.sqrt(math.log(4.0))
                max_amp = amp
            else:
                max_amp = np.maximum(max_amp, amp)

        # Energy: projection onto the mean phase direction minus the
        # absolute deviation from it (published sqrt form, not hypot).
        x_energy = np.sqrt(sum_e**2 + sum_o**2) + _EPS
        mean_e = sum_e / x_energy
        mean_o = sum_o / x_energy
        energy = np.zeros((rows, cols))
        for response in even_odd:
            energy += (
                response.real * mean_e
                + response.imag * mean_o
                - np.abs(response.real * mean_o - response.imag * mean_e)
            )

        # Total noise over the filter bank: geometric amplitude decay.
        total_tau = tau * (1.0 - (1.0 / MULT) ** NSCALE) / (1.0 - 1.0 / MULT)
        noise_mean = total_tau * math.sqrt(math.pi / 2.0)
        noise_sigma = total_tau * math.sqrt((4.0 - math.pi) / 2.0)
        energy = np.maximum(energy - (noise_mean + K_NOISE * noise_sigma), 0.0)

        # Frequency-spread weighting: penalize responses concentrated in
        # a single scale.
        width = (sum_amp / (max_amp + _EPS) - 1.0) / (NSCALE - 1)
        weight = 1.0 / (1.0 + np.exp(G_SHARPNESS * (CUTOFF - width)))

        # Published BARE division: 0/0 (exactly-flat input) -> NaN,
        # which downstream thresholds treat as False.
        with np.errstate(invalid="ignore", divide="ignore"):
            pc = weight * energy / sum_amp
        covx = pc * math.cos(angle)
        covy = pc * math.sin(angle)
        covx2 += covx * covx
        covy2 += covy * covy
        covxy += covx * covy

    covx2 /= NORIENT / 2.0
    covy2 /= NORIENT / 2.0
    covxy = 4.0 * covxy / NORIENT  # published association
    denom = np.sqrt(covxy * covxy + (covx2 - covy2) ** 2) + _EPS
    moment_max = (covy2 + covx2 + denom) / 2.0
    moment_min = (covy2 + covx2 - denom) / 2.0
    return moment_max + moment_min
