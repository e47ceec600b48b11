"""Classifier-output binary scans — SURVEY §2.1 S4 (.mat) / S5 (.h5).

Both are ``binaryFile`` scans whose per-file decode runs inside
``mapInPandas`` (scipy.io / h5py in the executor Python).  Neither
library ships in this container, so the decode bodies are import-gated;
the scan structure, schemas and row contracts are real.

Output contract (matches FIXTURES.md §3 / convert_h5_to_irfcb_format.R):
  sample string, roi_number int, class_name string,
  output_scores array<float>, thresholds array<float>
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def h5_class_scan(spark: SparkSession, path: str) -> DataFrame:
    """CNN score files: class_name / output_scores / roi_numbers /
    thresholds datasets (``convert_h5_to_irfcb_format.R:48-54``)."""
    files = _binary_scan(spark, path, "*.h5")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import h5py  # not in this container; executor envs ship it

        for pdf in batches:
            for sample, content in zip(pdf["sample"], pdf["content"]):
                with h5py.File(io.BytesIO(content), "r") as f:
                    scores = f["output_scores"][:]
                    rois = f["roi_numbers"][:]
                    names = [n.decode() for n in f["class_name"][:]]
                    thr = f["thresholds"][:]
                best = scores.argmax(axis=1)
                yield pd.DataFrame(
                    {
                        "sample": sample,
                        "roi_number": rois.astype("int32"),
                        "class_name": [names[i] for i in best],
                        "output_scores": list(scores.astype("float32")),
                        "thresholds": [thr.astype("float32")] * len(rois),
                    }
                )

    return files.mapInPandas(decode, schema=CLASS_SCORE_SCHEMA)


def mat_class_scan(spark: SparkSession, path: str) -> DataFrame:
    """RF classification files: TBclass/classifierName structs
    (``ifcb-dashboard-metadata-pipeline.Rmd:705-714``)."""
    files = _binary_scan(spark, path, "*.mat")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from scipy.io import loadmat  # not in this container

        for pdf in batches:
            for sample, content in zip(pdf["sample"], pdf["content"]):
                mat = loadmat(io.BytesIO(content))
                classes = [str(c[0]) for c in mat["TBclass"].ravel()]
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
