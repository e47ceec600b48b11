"""Grouped-extremum and rollup combinators — SURVEY §2.5 A1/A2/A5/A8.

The per-(sample,class) biovolume rollup (A1) is the reference's core
aggregation (``ifcb_summarize_biovolumes``, called at
``ifcb-data-pipeline.Rmd:476-486``).  On Spark it is a plain two-phase hash
aggregation — partial aggregates map-side, final merge after a shuffle on
the group keys — which is exactly the physical plan needed at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_top_k(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int = 1,
) -> DataFrame:
    """Top-k rows per group with deterministic ordering (A5:
    ``slice_max(counts_per_liter, n=1, with_ties=FALSE)``,
    ``ifcb_hab_alert.R:106-119``).  ``order_by`` must break ties."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def last_per_group(
    df: DataFrame,
    partition_by: list[str],
    ts_col: str,
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Latest row per group (A8: newest annotation per sample,
    ``ifcb_delivery_data_to_shark.R:268-277``)."""
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tie_break or []]
    return grouped_top_k(df, partition_by, order, k=1)


def biovolume_rollup(
    features: DataFrame,
    classes: DataFrame,
    hdr: DataFrame,
    keys: tuple[str, str] = ("sample", "roi_number"),
    class_col: str = "class_name",
    biovolume_col: str = "Biovolume",
    ml_col: str = "ml_analyzed",
    micron_factor: float = 1 / 3.4,
    drop_zero_volume: bool = True,
    carbon: Column | None = None,
) -> DataFrame:
    """Per-(sample, class) counts / biovolume / carbon with per-liter
    normalization (A1; per-liter math at ``ifcb-data-pipeline.Rmd:1410-1414``:
    ``x * 1000 / ml_analyzed``).

    ``features`` and ``classes`` join on (sample, roi); ``hdr`` contributes
    ``ml_analyzed`` per sample and is broadcast (one row per bin — always
    small relative to the per-ROI fact tables).
    ``carbon``: optional per-ROI carbon expression evaluated before the
    rollup (Menden-Deuer & Lessard-style function of biovolume + taxon).
    """
    sample_key, roi_key = keys
    vol_um3 = F.col(biovolume_col) * F.lit(micron_factor**3)
    per_roi = features.join(classes, [sample_key, roi_key], "inner")
    if drop_zero_volume:
        per_roi = per_roi.where(F.col(biovolume_col) > 0)
    per_roi = per_roi.withColumn("__vol_um3", vol_um3)
    if carbon is not None:
        per_roi = per_roi.withColumn("__carbon", carbon)
    aggs = [
        F.count(F.lit(1)).alias("counts"),
        (F.sum("__vol_um3") / F.lit(1e9)).alias("biovolume_mm3"),
    ]
    if carbon is not None:
        aggs.append(F.sum("__carbon").alias("carbon_ug"))
    rolled = per_roi.groupBy(sample_key, class_col).agg(*aggs)
    out = rolled.join(
        F.broadcast(hdr.select(sample_key, ml_col)), sample_key, "left"
    )
    out = (
        out.withColumn("counts_per_liter", F.col("counts") * 1000 / F.col(ml_col))
        .withColumn(
            "biovolume_mm3_per_liter", F.col("biovolume_mm3") * 1000 / F.col(ml_col)
        )
    )
    if carbon is not None:
        out = out.withColumn(
            "carbon_ug_per_liter", F.col("carbon_ug") * 1000 / F.col(ml_col)
        )
    return out


def taxon_rollup(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    first_cols: list[str],
    concat_cols: list[str],
    concat_sep: str = ", ",
) -> DataFrame:
    """Taxonomic re-aggregation (A2, ``ifcb_delivery_data_to_shark.R:328-357``):
    after the N:1 class→scientificname mapping, re-group summing measures,
    taking ``first`` of carried metadata and string-concatenating provenance
    columns in deterministic (sorted) order."""
    aggs: list[Column] = [F.sum(c).alias(c) for c in sum_cols]
    aggs += [F.first(c, ignorenulls=True).alias(c) for c in first_cols]
    aggs += [
        F.array_join(F.array_sort(F.collect_list(c)), concat_sep).alias(c)
        for c in concat_cols
    ]
    return df.groupBy(*keys).agg(*aggs)
