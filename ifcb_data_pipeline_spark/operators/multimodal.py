"""Multimodal (binary) column operators — SURVEY §2.1 S2, §2.9 U-kernels.

Images/audio/video are opaque ``binary`` columns with typed metadata
structs, processed by Arrow-batched ``mapInPandas`` kernels.  The Spark
plumbing — schemas, per-bin → per-ROI expansion, batch shapes, salted
repartitioning for skewed bins — is real and tested; the pixel-level
decode itself is stubbed deterministically because no imaging libraries
ship in this container (reference kernels: ``ifcb_features/*.py``, e.g.
``biovolume.py:56-158``, ``segmentation.py:117-186``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ROI_SCHEMA = T.StructType(
    [
        T.StructField("sample", T.StringType(), False),
        T.StructField("roi_number", T.IntegerType(), False),
        T.StructField("image", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("sample", T.StringType(), False),
        T.StructField("roi_number", T.IntegerType(), False),
        T.StructField("Area", T.DoubleType(), True),
        T.StructField("Biovolume", T.DoubleType(), True),
        T.StructField("EquivDiameter", T.DoubleType(), True),
        T.StructField("Perimeter", T.DoubleType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
    ]
)


def decode_image(raw: bytes) -> "object":
    """Pixel decode — stubbed: imaging libs are not in this container.
    The real kernel would wrap pyifcb/skimage here (S2/U1)."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "container; the Spark plumbing around it is real and tested"
    )


def explode_bins_to_rois(bins: DataFrame, rois_per_bin_col: str = "n_rois") -> DataFrame:
    """Bin → ROI expansion (S2, the only UDTF-shaped operator): one row per
    ROI with a deterministic fake payload sized from the metadata."""

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"sample": [], "roi_number": [], "image": [], "width": [], "height": []}
            for sample, n in zip(pdf["sample"], pdf[rois_per_bin_col]):
                for roi in range(1, int(n) + 1):
                    # Deterministic fake ROI bytes: repeatable across runs
                    # and engines; stands in for the .roi slice.
                    w = 8 + (roi % 16)
                    h = 8 + (roi * 3 % 16)
                    out["sample"].append(sample)
                    out["roi_number"].append(roi)
                    out["image"].append(bytes((roi * 31 + i) % 251 for i in range(w * h)))
                    out["width"].append(w)
                    out["height"].append(h)
            yield pd.DataFrame(out)

    return bins.mapInPandas(expand, schema=ROI_SCHEMA)


def extract_features(rois: DataFrame) -> DataFrame:
    """Per-ROI feature extraction harness (U1-U12 shape): Arrow-batched
    mapInPandas, vectorized numpy math over the batch.  The geometric
    formulas are placeholders for the real kernels; the batch shape,
    schema, and partition behavior are production-real."""

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            n_bytes = pdf["image"].map(len).astype("int32")
            w = pdf["width"].astype("float64")
            h = pdf["height"].astype("float64")
            area = w * h * 0.7
            equiv_d = np.sqrt(4.0 * area / np.pi)
            yield pd.DataFrame(
                {
                    "sample": pdf["sample"],
                    "roi_number": pdf["roi_number"],
                    "Area": area,
                    "Biovolume": area * equiv_d * 0.5,
                    "EquivDiameter": equiv_d,
                    "Perimeter": 2.0 * (w + h),
                    "n_bytes": n_bytes,
                }
            )

    return rois.mapInPandas(features, schema=FEATURE_SCHEMA)


def salt_skewed_bins(rois: DataFrame, partitions: int, salt_mod: int = 8) -> DataFrame:
    """Skew guard (SURVEY §7.3): bloom-day bins are huge; salting by
    ``(sample, roi mod k)`` keeps kernel stages balanced."""
    return rois.repartition(
        partitions, F.col("sample"), F.col("roi_number") % salt_mod
    )
