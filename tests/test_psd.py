"""U13: the closed-form OLS fit and the applyInPandas/numpy fit agree."""

from __future__ import annotations

import pytest

from ifcb_data_pipeline_spark.operators.psd import (
    psd_fit_pandas,
    psd_powerlaw_fit,
    size_histogram,
)
from ifcb_data_pipeline_spark.sources.tables import load_table


def test_closed_form_matches_numpy(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    hist = size_histogram(lineitem, "l_suppkey", "l_quantity", bin_width=5.0)
    closed = {r["sample"]: r for r in psd_powerlaw_fit(hist).collect()}
    numpy_ = {r["sample"]: r for r in psd_fit_pandas(hist).collect()}
    assert set(closed) == {k for k in numpy_ if numpy_[k]["n_bins"] >= 3}
    for s, c in closed.items():
        n = numpy_[s]
        assert c["k"] == pytest.approx(n["k"], rel=1e-9)
        assert c["a"] == pytest.approx(n["a"], rel=1e-9)
        assert c["r_sqr"] == pytest.approx(n["r_sqr"], rel=1e-9)


def test_powerlaw_recovers_known_exponent(spark):
    # n = 1000 * bin^-2 exactly → fit must recover k=-2, r²=1.
    rows = [(1, b, int(1000 * b**-2 * 1000)) for b in range(1, 8)]
    hist = spark.createDataFrame(rows, "sample long, bin int, n long")
    fit = psd_powerlaw_fit(hist).first()
    assert fit["k"] == pytest.approx(-2.0, abs=1e-3)
    assert fit["r_sqr"] == pytest.approx(1.0, abs=1e-4)
