"""ADC/ROI instrument-format reader — SURVEY §2.1 S2.

An IFCB bin stores its images as one flat ``.roi`` byte blob; the
``.adc`` CSV carries one row per trigger with the ROI geometry and the
image's start offset into the blob (consumed via pyifcb in the reference,
``extract_slim_features.py:62,103``).  Decoding is pure byte slicing:
``image = blob[start : start + width*height]`` (8-bit grayscale),
``width == 0`` rows are triggers without an image.

Spark shape: the ``.adc`` side is a plain distributed CSV scan; the
``.roi`` blobs come from ``binaryFile``; geometry rows are grouped per
bin and joined 1:1 with the blob so each blob crosses the wire exactly
once; the per-ROI slice runs in ``mapInPandas``.

Column layout follows the v2 (IFCB6+) ADC format; the indices are
parameters so v1 layouts stay readable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import ROI_SCHEMA

# 0-based column indices in the v2 ADC layout.  The trigger number in
# column 0 keys the ROI (scan-split-safe — spark.read.text does not
# guarantee line order, so a row_number would be wrong).
ADC_V2 = {
    "trigger": 0,
    "roi_x": 12,
    "roi_y": 13,
    "width": 14,
    "height": 15,
    "start_byte": 16,
}


def read_adc(
    spark: SparkSession, path: str, layout: dict[str, int] | None = None
) -> DataFrame:
    """``<path>/*.adc`` → (sample, roi_number, width, height, start_byte);
    roi_number is the trigger number from the ADC row itself."""
    layout = layout or ADC_V2
    raw = (
        spark.read.text(f"{path}/*.adc")
        .withColumn("file", F.input_file_name())
        .withColumn("sample", F.regexp_extract("file", r"([^/]+)\.adc$", 1))
    )
    parts = F.split(F.col("value"), ",")
    return raw.select(
        "sample",
        parts.getItem(layout["trigger"]).cast("int").alias("roi_number"),
        parts.getItem(layout["width"]).cast("int").alias("width"),
        parts.getItem(layout["height"]).cast("int").alias("height"),
        parts.getItem(layout["start_byte"]).cast("long").alias("start_byte"),
    )


def read_roi_images(
    spark: SparkSession, path: str, layout: dict[str, int] | None = None
) -> DataFrame:
    """Join the ADC geometry with the ``.roi`` blobs and slice out every
    image → ROI_SCHEMA rows (sample, roi_number, image, width, height)."""
    adc = read_adc(spark, path, layout)
    geom = adc.where(F.col("width") > 0).groupBy("sample").agg(
        F.sort_array(
            F.collect_list(F.struct("roi_number", "width", "height", "start_byte"))
        ).alias("rois")
    )
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.roi")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"([^/]+)\.roi$", 1).alias("sample"),
            "content",
        )
    )
    joined = blobs.join(geom, "sample")

    def slice_rois(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"sample": [], "roi_number": [], "image": [], "width": [], "height": []}
            for sample, blob, rois in zip(pdf["sample"], pdf["content"], pdf["rois"]):
                blob = bytes(blob)
                for roi in rois:
                    n = int(roi["width"]) * int(roi["height"])
                    start = int(roi["start_byte"])
                    out["sample"].append(sample)
                    out["roi_number"].append(int(roi["roi_number"]))
                    out["image"].append(blob[start : start + n])
                    out["width"].append(int(roi["width"]))
                    out["height"].append(int(roi["height"]))
            yield pd.DataFrame(out)

    return joined.mapInPandas(slice_rois, schema=ROI_SCHEMA)
