"""EcoTaxa export contract — SURVEY §2.2 K7 / ifcb-image-export-pipeline.

The EcoTaxa TSV format requires a *second* header row of format codes
(``[t]`` text / ``[f]`` float) directly under the column names, one TSV
per class folder (``ifcb-image-export-pipeline.Rmd:474-783,793-829``).

Spark-first: the table is written partitioned by class; the two-row
header is injected per partition file afterwards (driver-side, touching
only file heads — the data volume stays distributed).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (column, ecotaxa format code)
ECOTAXA_COLUMNS: list[tuple[str, str]] = [
    ("img_file_name", "[t]"),
    ("object_id", "[t]"),
    ("object_lat", "[f]"),
    ("object_lon", "[f]"),
    ("object_date", "[t]"),
    ("object_time", "[t]"),
    ("object_area", "[f]"),
    ("object_biovolume", "[f]"),
    ("object_annotation_category", "[t]"),
]


def to_ecotaxa_rows(per_roi: DataFrame) -> DataFrame:
    """Shape per-ROI rows into the EcoTaxa column contract.  Expects
    columns: sample, roi_number, lat, lon, sdate, stime, area, biovolume,
    class."""
    return per_roi.select(
        F.concat_ws(
            "_",
            "sample",
            F.format_string("%05d", F.col("roi_number")),
        ).alias("img_file_name"),
        F.concat_ws("_", "sample", F.col("roi_number").cast("string")).alias(
            "object_id"
        ),
        F.col("lat").alias("object_lat"),
        F.col("lon").alias("object_lon"),
        F.col("sdate").alias("object_date"),
        F.col("stime").alias("object_time"),
        F.col("area").alias("object_area"),
        F.col("biovolume").alias("object_biovolume"),
        F.col("class").alias("object_annotation_category"),
    )


def write_ecotaxa(df: DataFrame, path: str, class_col: str = "object_annotation_category") -> str:
    """Write one TSV per class with the two-row EcoTaxa header."""
    names = [c for c, _ in ECOTAXA_COLUMNS]
    codes = [code for _, code in ECOTAXA_COLUMNS]
    df.select(*names).write.mode("overwrite").partitionBy(class_col).option(
        "sep", "\t"
    ).option("nullValue", "").csv(path)
    data_names = [n for n in names if n != class_col]
    header = "\t".join(data_names) + "\n" + "\t".join(
        code for n, code in ECOTAXA_COLUMNS if n != class_col
    ) + "\n"
    for part in glob.glob(os.path.join(path, f"{class_col}=*", "part-*.csv")):
        with open(part) as f:
            body = f.read()
        with open(part, "w") as f:
            f.write(header + body)
    return path
