"""Closes the golden-chain qhull TRUST NOTE (round 17, VERDICT r16 #3).

The chain fixture's ConvexHull shim (`tools/gen_golden_chain.py`)
returns the provably-identical vertex SET of real qhull, in CCW order
starting from the LEXICOGRAPHIC MINIMUM vertex.  Real qhull may start
the cycle at a different vertex, which permutes the float summation
order of the Heron fan in `convex_hull_properties`
(blob_geometry.py:149-171).  These tests MEASURE that one degree of
freedom on every hull of the 19-shape chain panel:

- the fan is NOT bit-stable under cyclic rotation (7/20 hulls are; the
  rest produce 2-6 distinct ConvexArea bit-patterns) — so the fixture's
  ConvexArea/ConvexPerimeter/Solidity values carry a ≤4-ulp trust
  radius tied to the shim's cycle-start convention, PINNED here;
- the spread is bounded by 4 ulp of the value (absolute ~1e-12 on
  panel-scale areas), far below the 1e-4 driver rounding;
- the U5 biovolume BRANCH decision (area_ratio < 1.2, all.py:225-233)
  never flips under any rotation on any panel blob — the one place a
  last-ulp difference could cascade into a big value change;
- the shim's canonical start (lexicographic minimum) is asserted, so a
  silent change of convention regenerating the fixture cannot pass
  unnoticed.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np
import pytest

from ifcb_data_pipeline_spark.operators.kernels import (
    convex_hull_properties_ref,
    ellipse_properties_cov,
    find_blobs_sorted,
    hull_vertices_ref,
    perimeter_image,
)

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "golden_chain.json"


def _panel_hulls():
    fx = json.loads(FIXTURE.read_text())
    out = []
    for case in fx["cases"]:
        mask = np.array(
            [[c == "1" for c in row] for row in case["mask"]], dtype=bool
        )
        for i, blob in enumerate(find_blobs_sorted(mask)):
            border = perimeter_image(blob)
            pp = np.vstack(np.where(border)).T
            hull = hull_vertices_ref(pp)
            if hull is not None and len(hull) >= 3:
                out.append((f"{case['name']}[{i}]", blob, hull))
    return out


HULLS = _panel_hulls()


def test_panel_has_hulls():
    assert len(HULLS) >= 15


@pytest.mark.parametrize("name,blob,hull", HULLS, ids=[h[0] for h in HULLS])
def test_heron_fan_rotation_spread_bounded(name, blob, hull):
    """All cyclic starts agree to within 4 ulp on both hull metrics —
    the fixture's cycle-start trust radius, pinned."""
    pers, areas = [], []
    for k in range(len(hull)):
        per, area = convex_hull_properties_ref(np.roll(hull, k, axis=0))
        pers.append(per)
        areas.append(area)
    for vals in (pers, areas):
        lo, hi = min(vals), max(vals)
        assert hi - lo <= 4 * np.spacing(hi), (name, lo, hi)


@pytest.mark.parametrize("name,blob,hull", HULLS, ids=[h[0] for h in HULLS])
def test_biovolume_branch_rotation_invariant(name, blob, hull):
    """The SoR-vs-distmap branch (all.py:225-233) must not flip with the
    fan's summation order."""
    area = int(blob.sum())
    equiv_d = float(np.sqrt(4.0 * area / np.pi))
    maj, _, ecc = ellipse_properties_cov(blob)
    p = equiv_d / maj if maj else 0.0
    branches = set()
    for k in range(len(hull)):
        _, convex_area = convex_hull_properties_ref(np.roll(hull, k, axis=0))
        area_ratio = convex_area / area
        branches.add(area_ratio < 1.2 or (ecc < 0.8 and p > 0.8))
    assert len(branches) == 1, name


@pytest.mark.parametrize("name,blob,hull", HULLS, ids=[h[0] for h in HULLS])
def test_shim_cycle_starts_at_lexicographic_minimum(name, blob, hull):
    """Pin the convention the fixture was generated under: the hull
    cycle starts at the lexicographically smallest vertex."""
    lexmin = min(range(len(hull)), key=lambda i: (hull[i][0], hull[i][1]))
    assert lexmin == 0, (name, hull[0], hull[lexmin])
