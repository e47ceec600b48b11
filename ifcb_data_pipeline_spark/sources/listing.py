"""Directory-listing-as-table source — SURVEY §2.1 S13.

The reference turns ``list.files`` + regex into dataframes of bins and
versions, e.g. picking ``max(version)`` per year
(``ifcb-data-pipeline.Rmd:171-191``).  Spark-first: ``binaryFile`` scan
without content (``pathGlobFilter``), file metadata columns only, then
plain DataFrame ops for the version logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def list_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """(path, name, length, modificationTime) for every matching file —
    content is never read (dropped before any action)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .drop("content")
    )
    return df.withColumn(
        "name", F.regexp_extract(F.col("path"), r"([^/]+)$", 1)
    )


def max_version_per_year(
    files: DataFrame,
    version_pattern: str = r"_v(\d+)",
    year_pattern: str = r"D(\d{4})",
) -> DataFrame:
    """Pick the newest version per year (Rmd:171-191 semantics)."""
    parsed = files.select(
        "path",
        "name",
        F.regexp_extract("name", year_pattern, 1).cast("int").alias("year"),
        F.regexp_extract("name", version_pattern, 1).cast("int").alias("version"),
    ).where(F.col("year").isNotNull() & F.col("version").isNotNull())
    w = Window.partitionBy("year").orderBy(F.col("version").desc(), F.col("name"))
    return (
        parsed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def size_gated(files: DataFrame, max_bytes: int = 536870912) -> tuple[DataFrame, DataFrame]:
    """F9 large/empty-file guards (``ifcb_ingest_and_qc.R:49-50,114-141``):
    returns (ok, skipped) — skipped is the logged side output.

    Note: the binaryFile source already omits 0-byte files from the scan,
    so the empty-file arm only matters for listings from other sources."""
    ok = files.where((F.col("length") > 0) & (F.col("length") <= max_bytes))
    skipped = files.where((F.col("length") == 0) | (F.col("length") > max_bytes))
    return ok, skipped
