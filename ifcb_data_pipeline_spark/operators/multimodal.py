"""Multimodal (binary) column operators — SURVEY §2.1 S2, §2.9 U-kernels.

Images/audio/video are opaque ``binary`` columns with typed metadata
structs, processed by Arrow-batched ``mapInPandas`` kernels.  The Spark
plumbing — schemas, per-bin → per-ROI expansion, batch shapes, salted
repartitioning for skewed bins — is real and tested; pixel decode is
real too (:mod:`.image_codec`: pure-numpy PGM/BMP/raw-slab), with only
compressed container formats (PNG/JPEG) left to an imaging library
(reference kernels: ``ifcb_features/*.py``, e.g. ``biovolume.py:56-158``,
``segmentation.py:117-186``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .image_codec import decode_image  # noqa: F401  (re-export: S2 decode API)

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


def explode_bins_to_rois(bins: DataFrame, rois_per_bin_col: str = "n_rois") -> DataFrame:
    """Bin → ROI expansion (S2, the only UDTF-shaped operator): one row per
    ROI.  The payload is a real (deterministic) PGM image so downstream
    kernels exercise the actual decode path, not a byte-length stand-in."""
    from .image_codec import encode_pgm

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"sample": [], "roi_number": [], "image": [], "width": [], "height": []}
            for sample, n in zip(pdf["sample"], pdf[rois_per_bin_col]):
                for roi in range(1, int(n) + 1):
                    # Deterministic fake pixels: repeatable across runs and
                    # engines; stands in for the .roi slice.
                    w = 8 + (roi % 16)
                    h = 8 + (roi * 3 % 16)
                    px = (roi * 31 + np.arange(w * h)) % 251
                    out["sample"].append(sample)
                    out["roi_number"].append(roi)
                    out["image"].append(encode_pgm(px.astype(np.uint8).reshape(h, w)))
                    out["width"].append(w)
                    out["height"].append(h)
            yield pd.DataFrame(out)

    return bins.mapInPandas(expand, schema=ROI_SCHEMA)


def extract_features(rois: DataFrame) -> DataFrame:
    """Per-ROI feature extraction harness (U1-U12 shape): Arrow-batched
    mapInPandas with a REAL pixel decode (:mod:`.image_codec`), then
    vectorized numpy math over the decoded dimensions.  The geometric
    formulas are the oracle-mirrorable placeholders (the full kernel
    chain lives in :mod:`.kernels`); the decode, batch shape, schema,
    and partition behavior are production-real."""

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            dims = [
                decode_image(bytes(blob), wm, hm).shape
                for blob, wm, hm in zip(pdf["image"], pdf["width"], pdf["height"])
            ]
            h = np.array([d[0] for d in dims], dtype="float64")
            w = np.array([d[1] for d in dims], dtype="float64")
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
                    # decoded pixel count — invariant to container framing
                    "n_bytes": (w * h).astype("int32"),
                }
            )

    return rois.mapInPandas(features, schema=FEATURE_SCHEMA)


def salt_skewed_bins(rois: DataFrame, partitions: int, salt_mod: int = 8) -> DataFrame:
    """Skew guard (SURVEY §7.3): bloom-day bins are huge; salting by
    ``(sample, roi mod k)`` keeps kernel stages balanced."""
    return rois.repartition(
        partitions, F.col("sample"), F.col("roi_number") % salt_mod
    )
