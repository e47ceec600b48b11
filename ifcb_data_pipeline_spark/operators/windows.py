"""Window-function combinators — SURVEY §2.6 W1/W3 and §2.3 F5.

The reference's bubble-adjacency removal operates on implicit row order of
an aggregated in-memory frame (``ifcb-data-pipeline.Rmd:1270-1297``) —
Spark has no implicit order, so :func:`adjacency_flag_filter` defines the
ordering explicitly (sample timestamp) as SURVEY §7.3 prescribes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def adjacency_flag_filter(
    df: DataFrame,
    flag_col: str,
    flag_value: str,
    order_by: list[str],
    partition_by: list[str] | None = None,
    reach: int = 1,
) -> DataFrame:
    """Drop rows whose flag contains ``flag_value`` **and** their ±reach
    neighbors in the defined ordering (F5: bubbles kill the previous and
    next sample too, ``ifcb_delivery_data_to_shark.R:412-440``)."""
    w = Window.partitionBy(*(partition_by or [F.lit(1)])).orderBy(
        *[F.col(c) for c in order_by]
    )
    hit = F.coalesce(
        F.lower(F.col(flag_col)).contains(flag_value.lower()), F.lit(False)
    )
    cond = hit
    for i in range(1, reach + 1):
        cond = cond | F.coalesce(
            F.lag(hit, i).over(w), F.lit(False)
        ) | F.coalesce(F.lead(hit, i).over(w), F.lit(False))
    return df.withColumn("__drop", cond).where(~F.col("__drop")).drop("__drop")


def gap_fill(
    df: DataFrame,
    cols: list[str],
    partition_by: list[str],
    order_by: list[str],
    direction: str = "downup",
) -> DataFrame:
    """tidyr ``fill(..., .direction="downup")`` (W3,
    ``compare_microscopy.R:127-129``): forward-fill nulls from the last
    non-null value, then backward-fill leading nulls from the next one."""
    order = [F.col(c) for c in order_by]
    w_down = (
        Window.partitionBy(*partition_by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_up = (
        Window.partitionBy(*partition_by)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    out = df
    for c in cols:
        filled = F.col(c)
        if "down" in direction:
            filled = F.coalesce(filled, F.last(c, ignorenulls=True).over(w_down))
        if "up" in direction:
            filled = F.coalesce(filled, F.first(c, ignorenulls=True).over(w_up))
        out = out.withColumn(c, filled)
    return out
