"""Bucketed-table materialization — the shuffle-free co-located join path.

At 100 TB the dominant recurring cost of the fact⋈fact joins (per-ROI
features ⋈ per-ROI class scores, rollup ⋈ sample metadata) is the
exchange on the join key.  Bucketing amortizes it: write both tables
``bucketBy(key)`` once, and every subsequent equi-join or aggregation on
that key runs exchange-free (Spark reads bucket files as pre-hashed
partitions).  ``tests/test_physical_plans.py::test_bucketed_join_is_
exchange_free`` pins the property.

The reference has no equivalent (single-node R holds everything in
memory); this is the Spark-native answer to its repeated
join-on-sample-id passes (``ifcb-data-pipeline.Rmd:1094-1103``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize ``df`` as an external bucketed (and optionally
    sorted) table.  ``num_buckets`` should be sized so one bucket of the
    LARGEST co-bucketed table fits an executor core (~128-512 MB)."""
    writer = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog —
    a plain ``spark.read.parquet`` of the same files would NOT be
    exchange-free)."""
    return spark.table(table)
