"""SQLite source — SURVEY §2.1 S10.

The reference reads the ClassiPyR manual-annotations table from a SQLite
db (``ifcb_delivery_data_to_shark.R:236-243``).  Annotation tables are
small (human-generated) so the reference's driver-side read is the right
shape; rows land in a DataFrame and join distributed from there.  For a
big table the same function signature would switch to ``spark.read.jdbc``
with a partition column.
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame, SparkSession


def read_sqlite_table(
    spark: SparkSession, db_path: str, table: str, schema: str | None = None
) -> DataFrame:
    con = sqlite3.connect(db_path)
    try:
        cur = con.execute(f"SELECT * FROM {table}")  # noqa: S608 (trusted path)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()
    if schema is None:
        schema = ", ".join(f"{c} string" for c in cols)
    return spark.createDataFrame(rows, schema)
