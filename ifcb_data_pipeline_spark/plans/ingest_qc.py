"""Composed incremental ingest + QC job — SURVEY §3.2
(``code/ifcb_ingest_and_qc.R``).

One tick:  list bins → size gates (F9) → anti-join work queue (I2) →
bin→ROI expansion + feature kernel (S2/U1-U12, stub decode) → PSD fit +
flags (U13) → append feature/psd outputs + ledger (I4).  Re-runs are
idempotent; a new delivery of bins processes only the new bins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.kernels import features_from_images
from ..operators.multimodal import explode_bins_to_rois
from ..operators.psd import psd_flags, psd_powerlaw_fit, size_histogram
from ..streaming.incremental import CheckpointedJob


def ingest_tick(
    spark: SparkSession,
    bins: DataFrame,
    checkpoint_dir: str,
    output_dir: str,
) -> dict[str, int]:
    """Process unseen bins; returns counters for the run report
    (the reference prints these in its knit summary, Rmd:1606-1618)."""
    job = CheckpointedJob(spark, checkpoint_dir, "sample")
    todo = job.pending(bins).cache()
    n_bins = todo.count()
    if n_bins == 0:
        return {"bins": 0, "rois": 0, "psd_flagged": 0}

    rois = explode_bins_to_rois(todo)
    # Full U1-U12 kernel chain (real segmentation → geometry → biovolume);
    # the PSD stage consumes the resulting EquivDiameter like the
    # reference's feature→psd handoff (ifcb_ingest_and_qc.R:500-518).
    features = features_from_images(rois).cache()
    n_rois = features.count()
    features.write.mode("append").parquet(f"{output_dir}/features")

    hist = size_histogram(
        features.withColumn("sample_key", F.col("sample").cast("long")),
        "sample_key",
        "EquivDiameter",
        bin_width=2.0,
    )
    fits = psd_powerlaw_fit(hist)
    flags = psd_flags(fits)
    flagged = flags.where(F.col("flag").isNotNull())
    n_flagged = flagged.count()
    fits.join(flags, "sample").write.mode("append").parquet(f"{output_dir}/psd")

    job.mark_done(todo.select("sample"))
    features.unpersist()
    todo.unpersist()
    return {"bins": n_bins, "rois": n_rois, "psd_flagged": n_flagged}
