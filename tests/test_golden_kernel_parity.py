"""U5/U11 golden parity against the reference's own runnable kernels.

``tests/fixtures/golden_kernels.json`` was produced by
``tools/gen_golden_kernels.py`` executing the reference package's
biovolume/rotation implementations
(``code/python/ifcb-features/ifcb_features/biovolume.py:56-158``,
``blobs.py:32-149``) on a 14-shape deterministic ROI panel, with the
absent scipy/skimage primitives satisfied by independent brute-force
exact shims.  These tests pin our kernels FLOAT-FOR-FLOAT (and the
rotation masks pixel-for-pixel) against those recorded outputs —
reference-certified parity, not analytic self-certification.

The panel deliberately includes the hazard shapes: holes (annulus),
concavity (crescent, star), diagonal-only connectivity (diag_joined —
exercises the 4-conn fill-holes flood), degenerate blobs (single pixel,
2×2, 1×30 line), a tilted ellipse, and a PRNG speckle blob.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np
import pytest

from ifcb_data_pipeline_spark.operators.kernels import (
    biovolume_distmap,
    biovolume_sor_raster,
)
from ifcb_data_pipeline_spark.operators.rotation import rotate_blob

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "golden_kernels.json"
GOLDEN = json.loads(FIXTURE.read_text())


def _mask(rows: list[str]) -> np.ndarray:
    return np.array([[c == "1" for c in row] for row in rows], dtype=bool)


CASES = {c["name"]: c for c in GOLDEN["cases"]}


@pytest.mark.parametrize("name", sorted(CASES))
def test_distmap_biovolume_matches_reference(name):
    case = CASES[name]
    out = biovolume_distmap(_mask(case["mask"]))
    g = case["distmap"]
    assert out["Biovolume"] == float(g["volume"]), name
    assert out["RepresentativeWidth"] == float(g["x"]), name
    assert out["SurfaceArea"] == float(g["sa"]), name


@pytest.mark.parametrize("name", sorted(CASES))
def test_sor_biovolume_matches_reference(name):
    case = CASES[name]
    out = biovolume_sor_raster(_mask(case["mask"]))
    g = case["sor"]
    assert out["Biovolume"] == float(g["volume"]), name
    assert out["RepresentativeWidth"] == float(g["xr"]), name
    assert out["SurfaceArea"] == float(g["sa"]), name


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("angle", [str(a) for a in GOLDEN["angles"]])
def test_rotate_blob_matches_reference(name, angle):
    case = CASES[name]
    got = rotate_blob(_mask(case["mask"]), float(angle))
    want = _mask(case["rotations"][angle])
    assert got.shape == want.shape, (name, angle)
    assert (got == want).all(), (
        name,
        angle,
        int((got != want).sum()),
    )
