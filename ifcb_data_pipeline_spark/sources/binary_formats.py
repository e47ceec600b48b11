"""Classifier-output binary scans — SURVEY §2.1 S4 (.mat) / S5 (.h5).

Both are ``binaryFile`` scans whose per-file decode runs inside
``mapInPandas``.  S4 decodes with the repo's own pure-Python MAT v5
parser (:mod:`.mat_v5`) — no scipy needed, byte-exact tested against
spec-built fixtures.  S5's HDF5 container cannot be parsed without
h5py (and without h5py no real fixture bytes can even be generated),
so the decode is an injected-parser seam: the default implementation
imports h5py, and tests inject a parser over a simple fixture format
to exercise the full Spark plumbing.

Output contract (matches FIXTURES.md §3 / convert_h5_to_irfcb_format.R):
  sample string, roi_number int, class_name string,
  output_scores array<float>, thresholds array<float>
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .mat_v5 import parse_mat_v5

CLASS_SCORE_SCHEMA = T.StructType(
    [
        T.StructField("sample", T.StringType(), False),
        T.StructField("roi_number", T.IntegerType(), False),
        T.StructField("class_name", T.StringType(), True),
        T.StructField("output_scores", T.ArrayType(T.FloatType()), True),
        T.StructField("thresholds", T.ArrayType(T.FloatType()), True),
    ]
)


def _binary_scan(spark: SparkSession, path: str, glob: str) -> DataFrame:
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"([^/]+)\.\w+$", 1).alias("sample"),
            "content",
        )
    )


def _default_h5_parser(content: bytes) -> dict:
    """HDF5 decode: h5py when available (full format coverage), else the
    repo's pure-Python subset reader (:mod:`.hdf5_lite` — superblock v0,
    v1 headers, contiguous datasets: exactly what the score pipeline
    writes)."""
    import io

    try:
        import h5py
    except ImportError:
        from .hdf5_lite import read_hdf5

        d = read_hdf5(content)
        return {
            "output_scores": d["output_scores"],
            "roi_numbers": d["roi_numbers"],
            "class_name": [
                n.decode() if isinstance(n, bytes) else str(n)
                for n in d["class_name"].tolist()
            ],
            "thresholds": d["thresholds"],
        }

    with h5py.File(io.BytesIO(content), "r") as f:
        return {
            "output_scores": f["output_scores"][:],
            "roi_numbers": f["roi_numbers"][:],
            "class_name": [n.decode() for n in f["class_name"][:]],
            "thresholds": f["thresholds"][:],
        }


def h5_class_scan(
    spark: SparkSession,
    path: str,
    parser: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """CNN score files: class_name / output_scores / roi_numbers /
    thresholds datasets (``convert_h5_to_irfcb_format.R:48-54``).

    ``parser``: bytes → {output_scores, roi_numbers, class_name,
    thresholds}; defaults to h5py.  The seam lets the scan be tested
    hermetically where h5py is unavailable."""
    files = _binary_scan(spark, path, "*.h5")
    parse = parser or _default_h5_parser

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            for sample, content in zip(pdf["sample"], pdf["content"]):
                d = parse(bytes(content))
                scores = np.asarray(d["output_scores"], dtype="float32")
                rois = np.asarray(d["roi_numbers"])
                names = list(d["class_name"])
                thr = np.asarray(d["thresholds"], dtype="float32")
                best = scores.argmax(axis=1)
                yield pd.DataFrame(
                    {
                        "sample": sample,
                        "roi_number": rois.astype("int32"),
                        "class_name": [names[i] for i in best],
                        "output_scores": list(scores),
                        "thresholds": [thr] * len(rois),
                    }
                )

    return files.mapInPandas(decode, schema=CLASS_SCORE_SCHEMA)


def mat_class_scan(spark: SparkSession, path: str) -> DataFrame:
    """RF classification files: TBclass cell array of class-name char
    arrays (+ classifierName), decoded with the repo's pure-Python MAT v5
    parser (``ifcb-dashboard-metadata-pipeline.Rmd:705-714``)."""
    files = _binary_scan(spark, path, "*.mat")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for sample, content in zip(pdf["sample"], pdf["content"]):
                mat = parse_mat_v5(bytes(content))
                classes = [str(c) for c in mat["TBclass"]]
                yield pd.DataFrame(
                    {
                        "sample": sample,
                        "roi_number": range(1, len(classes) + 1),
                        "class_name": classes,
                        "output_scores": [None] * len(classes),
                        "thresholds": [None] * len(classes),
                    }
                )

    return files.mapInPandas(decode, schema=CLASS_SCORE_SCHEMA)
