"""Loaders for the driver-generated synthetic parquet tables.

Mirrors SURVEY §2.1 S3/S8-style tabular scans: schema'd parquet reads with
column pruning and predicate pushdown left to Catalyst.  At 100 TB the fact
tables (``lineitem``, ``orders``, ``events``) would be laid out partitioned
by date (`year/month` directories) so calendar filters prune partitions;
the loaders here read whatever layout the directory holds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor.
DIM_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.ts is TIMESTAMP(MICROS) parquet (verified across every driver
    # sf dir); the batch loaders and the streaming queries (which hard-code
    # `ts timestamp` in their readStream schemas) both rely on that.  An
    # earlier-round TIMESTAMP(NANOS) shim (nanosAsLong conf + bigint
    # floor-convert branch) was removed once the micros layout proved
    # stable — if a future data refresh ships NANOS again, the vectorized
    # reader fails loudly on the scan rather than silently mis-typing.
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL-expressed queries)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
