"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in ``ifcb_data_pipeline_spark/queries/`` — one module per
SURVEY §2 operator family, each entry registered as a (Spark callable,
DuckDB oracle SQL) pair.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ifcb_data_pipeline_spark.queries import load_all  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
_FLAGSHIP = "p1_shark_export"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the composed SHARK-export pipeline — rollup,
    enrichment joins, taxa cleaning, QC windows, export math) on
    /root/testdata/sf0.001."""
    registry = load_all()
    return registry[_FLAGSHIP].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY §2."""
    return {name: qdef.fn for name, qdef in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    return {
        name: qdef.oracle
        for name, qdef in load_all().items()
        if qdef.oracle is not None
    }
