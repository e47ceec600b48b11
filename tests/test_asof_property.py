"""Randomized cross-validation of asof_join against pandas merge_asof.

The sf0.01 oracle exercises one data distribution; these tests drive the
bucketed 3-probe decomposition over seeded random timestamp clouds —
including ties, empty tolerance windows, and bucket-edge placements —
and require exact agreement with ``pandas.merge_asof`` (the de-facto
reference semantics for backward/forward as-of joins).  Three seeds,
one Spark job each: bounded runtime, fresh data shapes every seed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ifcb_data_pipeline_spark.operators.joins import asof_join

TOL = 60  # seconds


def _frames(seed: int):
    rng = np.random.default_rng(seed)
    n_l, n_r = 80, 120
    base = pd.Timestamp("2024-03-01")
    # Cluster timestamps so some left rows have many candidates, some none;
    # integer seconds make distance ties reachable (the tie_break path).
    lts = base + pd.to_timedelta(rng.integers(0, 4000, n_l), unit="s")
    rts = base + pd.to_timedelta(rng.integers(0, 4000, n_r), unit="s")
    left = pd.DataFrame({"lid": np.arange(n_l), "lts": lts})
    right = pd.DataFrame({"rid": np.arange(n_r), "rts": rts})
    return left, right


@pytest.mark.parametrize("seed", [7, 19, 23])
@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas_merge_asof(spark, seed, direction):
    left, right = _frames(seed)
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    out = asof_join(
        sl,
        sr,
        left_ts="lts",
        right_ts="rts",
        tolerance_seconds=TOL,
        direction=direction,
        tie_break=["rid"],
    )
    got = {int(r["lid"]): r["rid"] for r in out.collect()}

    # Emulate the operator's min-rid tie break: within an equal-ts block
    # merge_asof keeps the LAST row for backward (last rts <= lts in sort
    # order) but the FIRST row for forward (first rts >= lts), so sort rid
    # descending for backward and ascending for forward to make the
    # winner rid-min in both directions.
    r_sorted = right.sort_values(
        ["rts", "rid"], ascending=[True, direction == "forward"]
    ).reset_index(drop=True)
    exp_df = pd.merge_asof(
        left.sort_values("lts"),
        r_sorted,
        left_on="lts",
        right_on="rts",
        direction=direction,
        tolerance=pd.Timedelta(seconds=TOL),
        allow_exact_matches=True,
    )
    exp = {
        int(row.lid): (None if pd.isna(row.rid) else int(row.rid))
        for row in exp_df.itertuples()
    }

    assert set(got) == set(exp), "left-outer row set differs"
    mismatches = {
        k: (got[k], exp[k]) for k in exp if (got[k] or None) != (exp[k] or None)
        and got[k] != exp[k]
    }
    assert not mismatches, f"seed={seed} dir={direction}: {mismatches}"
