"""HDR instrument-header source — SURVEY §2.1 S1.

The reference reads ``.hdr`` key:value headers per bin via
``ifcb_read_hdr_data`` (``ifcb-data-pipeline.Rmd:246``;
``code/ifcb_ingest_and_qc.R:259-263``) producing one row per bin with GPS
position, timestamps and instrument metadata.

Spark-first design: ``spark.read.text`` with ``input_file_name()`` — the
whole directory of headers becomes one distributed scan; per-file
key/value assembly is a groupBy on the file name (no driver-side loops,
no Python UDF).  Output is a fixed StructType with the bin id parsed from
the file name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.bin_id import parse_bin_id

# Keys the reference consumes (gps_only subset at Rmd:250-254).
HDR_KEYS = {
    "gpsLatitude": "double",
    "gpsLongitude": "double",
    "gpsTimeFromFix": "string",
    "mlAnalyzed": "double",
    "sampleNumber": "int",
    "runTime": "double",
    "inhibitTime": "double",
}


def read_hdr_directory(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``<path>/**/*.hdr`` → one row per bin, fixed schema."""
    lines = (
        spark.read.text(f"{path}/*.hdr")
        .withColumn("file", F.input_file_name())
        .where(F.col("value").contains(":"))
    )
    kv = lines.select(
        "file",
        F.trim(F.substring_index("value", ":", 1)).alias("k"),
        F.trim(F.expr("substring(value, instr(value, ':') + 1)")).alias("v"),
    ).where(F.col("k").isin(*HDR_KEYS))

    pivoted = (
        kv.groupBy("file")
        .pivot("k", list(HDR_KEYS))
        .agg(F.first("v", ignorenulls=True))
    )
    sample = F.regexp_extract(
        F.col("file"), r"([^/]+)\.hdr$", 1
    )
    typed = pivoted.select(
        sample.alias("sample"),
        *[
            F.col(k).cast(t).alias(k)
            for k, t in HDR_KEYS.items()
        ],
    )
    return typed.withColumn("parsed", parse_bin_id(F.col("sample"))).select(
        "sample",
        F.col("parsed.timestamp").alias("timestamp"),
        F.col("parsed.date").alias("date"),
        F.col("parsed.ifcb_number").alias("ifcb_number"),
        *HDR_KEYS,
    )
