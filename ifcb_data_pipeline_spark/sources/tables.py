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
    # events.ts physical type varies by driver generation: currently
    # TIMESTAMP(MICROS) (reads directly; the branch below is a no-op), but
    # earlier rounds shipped TIMESTAMP(NANOS), which the vectorized reader
    # rejects outright.  The nanosAsLong conf + bigint branch keep the
    # engine working on that variant: nanos surface as bigint and are
    # floor-converted to micros (DuckDB's TIMESTAMP_NS → TIMESTAMP cast
    # floors identically, so the oracles agree).  Harmless for micros data
    # — the conf only affects NANOS columns and the branch only fires when
    # ts scans as bigint.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL-expressed queries)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
