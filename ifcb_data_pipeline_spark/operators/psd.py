"""Particle-size-distribution QC — SURVEY §2.9 U13.

The reference fits a power law to each sample's particle-size histogram
and derives QC flags from the fit (parameters at
``ifcb-data-pipeline.Rmd:651-669`` and ``ifcb_ingest_and_qc.R:500-518``).

Spark-first: the log-log power-law fit is closed-form OLS, so it runs as
a plain two-phase aggregation (``covar_pop``/``var_pop``/``corr``) — no
Python, no per-group pandas, scales like any groupBy.  An
``applyInPandas`` variant (:func:`psd_fit_pandas`) exists for kernels
that genuinely need numpy (e.g. nonlinear refits); the two agree to
float tolerance (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def size_histogram(
    per_roi: DataFrame,
    sample_col: str,
    size_col: str,
    bin_width: float = 5.0,
    min_bin: int = 1,
) -> DataFrame:
    """Per-(sample, size-bin) counts, bins below ``min_bin`` dropped
    (the reference fits from bin 15 up)."""
    binned = per_roi.select(
        F.col(sample_col).alias("sample"),
        F.floor(F.col(size_col) / bin_width).cast("int").alias("bin"),
    ).where(F.col("bin") >= min_bin)
    return binned.groupBy("sample", "bin").agg(F.count(F.lit(1)).alias("n"))


def psd_powerlaw_fit(hist: DataFrame, min_points: int = 3) -> DataFrame:
    """Per-sample OLS of ``log10(n) ~ log10(bin)``: returns a (amplitude),
    k (exponent), r_sqr, n_bins.  n = a * bin^k  ⇔  log n = log a + k log bin."""
    logged = hist.select(
        "sample",
        F.log10(F.col("bin").cast("double")).alias("x"),
        F.log10(F.col("n").cast("double")).alias("y"),
    )
    fitted = logged.groupBy("sample").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.covar_pop("x", "y").alias("__cxy"),
        F.var_pop("x").alias("__vx"),
        F.var_pop("y").alias("__vy"),
        F.avg("y").alias("__my"),
        F.avg("x").alias("__mx"),
    )
    # r computed manually with an explicit zero-variance guard: engines
    # disagree on corr()'s NaN-vs-NULL behavior at zero variance.
    k = F.col("__cxy") / F.col("__vx")
    r2 = F.when(
        (F.col("__vx") > 0) & (F.col("__vy") > 0),
        (F.col("__cxy") * F.col("__cxy")) / (F.col("__vx") * F.col("__vy")),
    )
    return fitted.where((F.col("n_bins") >= min_points) & (F.col("__vx") > 0)).select(
        "sample",
        "n_bins",
        F.pow(F.lit(10.0), F.col("__my") - k * F.col("__mx")).alias("a"),
        k.alias("k"),
        r2.alias("r_sqr"),
    )


def psd_flags(fits: DataFrame) -> DataFrame:
    """Reference-style flag rules on the fit (threshold profile shaped
    after ``ifcb_ingest_and_qc.R:500-518``)."""
    return fits.select(
        "sample",
        F.concat_ws(
            ", ",
            F.when(F.col("r_sqr") < 0.5, F.lit("Poor fit")),
            F.when(F.col("k") > -1.0, F.lit("Bubbles")),
            F.when(F.col("n_bins") < 5, F.lit("Incomplete")),
        ).alias("flag"),
    ).withColumn("flag", F.nullif(F.col("flag"), F.lit("")))


def psd_fit_pandas(hist: DataFrame, min_points: int = 3) -> DataFrame:
    """applyInPandas variant (numpy lstsq per sample) — the escape hatch
    for genuinely non-closed-form kernels."""
    import pandas as pd

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(pdf) < min_points:
            return pd.DataFrame(
                columns=["sample", "n_bins", "a", "k", "r_sqr"]
            ).astype({"sample": "int64", "n_bins": "int64"})
        x = np.log10(pdf["bin"].to_numpy(dtype="float64"))
        y = np.log10(pdf["n"].to_numpy(dtype="float64"))
        k, c = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        return pd.DataFrame(
            {
                "sample": [pdf["sample"].iloc[0]],
                "n_bins": [len(pdf)],
                "a": [10.0**c],
                "k": [k],
                "r_sqr": [r * r],
            }
        )

    return hist.groupBy("sample").applyInPandas(
        fit, schema="sample long, n_bins long, a double, k double, r_sqr double"
    )
