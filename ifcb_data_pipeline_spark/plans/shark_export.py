"""Composed pipeline mirroring the reference's annual SHARK export
(SURVEY §3.1, ``ifcb-data-pipeline.Rmd`` stages 4-11).

Stage map (reference → here):
  biovolume rollup (Rmd:476-486)      → per-(sample, taxon) aggregation
  7-way join chain (Rmd:1094-1103)    → broadcast enrichment joins
  taxa cleaning (Rmd:936-971)         → clean_taxa_name on the class label
  bubble adjacency (Rmd:1270-1297)    → window over samples ordered by date
  per-liter + signif (Rmd:1398-1443)  → COEFF math + signif(·, 6)

All dimension joins broadcast; the only shuffles are the two keyed
aggregations and the global sample window — the minimal plan for this
dataflow at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.taxa import clean_taxa_name
from ..queries._util import dround, taxa_label_expr


def shark_export(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    part: DataFrame,
) -> DataFrame:
    # Taxa cleaning runs on the *dimension* (one row per part), never on
    # the per-ROI fact rows — the SURVEY §2.8 C4 rule: resolve distinct
    # names once, broadcast the mapping.  22 regexes × 2k dim rows instead
    # of × 600M fact rows at scale.
    label = taxa_label_expr(F.col("p_name"), F.col("p_partkey"))
    part_taxon = part.select(
        "p_partkey", clean_taxa_name(label).alias("taxon")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_roi = (
        lineitem.join(F.broadcast(part_taxon), F.col("l_partkey") == F.col("p_partkey"))
        .where(F.col("l_quantity") > 0)
        .select(
            F.col("l_orderkey").alias("sample"),
            F.col("taxon"),
            vol.alias("vol"),
        )
    )
    rolled = per_roi.groupBy("sample", "taxon").agg(
        F.count(F.lit(1)).alias("counts"), F.sum("vol").alias("vol_sum")
    )

    # Sample metadata ("hdr"): date, ml_analyzed, and "bubble" QC flag;
    # bubble samples kill their date-ordered neighbors (Rmd:1270-1297).
    w = Window.orderBy("o_orderdate", "o_orderkey")
    bubble = F.col("o_orderstatus") == "P"
    hdr = orders.select(
        F.col("o_orderkey").alias("sample"),
        F.col("o_orderdate").alias("sample_date"),
        (F.col("o_totalprice") / 1000.0).alias("ml_analyzed"),
        F.col("o_custkey"),
        (
            bubble
            | F.coalesce(F.lag(bubble).over(w), F.lit(False))
            | F.coalesce(F.lead(bubble).over(w), F.lit(False))
        ).alias("qc_drop"),
    ).where(~F.col("qc_drop"))

    # Geo enrichment: customer → nation ("basin").
    geo = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select(F.col("c_custkey"), F.col("n_name").alias("basin"))

    merged = rolled.join(hdr, "sample").join(
        F.broadcast(geo), hdr.o_custkey == geo.c_custkey, "left"
    )

    coeff = dround(F.lit(1000.0) / F.col("ml_analyzed"), 1)
    abund = dround(F.col("counts") * 1000.0 / F.col("ml_analyzed"), 1)
    # signif(x, 6) with cross-engine floor-form rounding.
    mag = F.floor(F.log10(F.abs(F.col("vol_sum"))))
    biovol = F.when(F.col("vol_sum") == 0, F.lit(0.0)).otherwise(
        F.floor((F.col("vol_sum") / F.pow(10.0, mag)) * 1e5 + 0.5) / 1e5 * F.pow(10.0, mag)
    )
    return merged.select(
        "sample",
        "taxon",
        F.col("basin"),
        F.date_format("sample_date", "yyyy-MM-dd").alias("sdate"),
        F.month("sample_date").alias("month"),
        F.month("sample_date").between(5, 10).alias("in_season"),
        F.col("counts"),
        coeff.alias("coeff"),
        abund.alias("abund_per_l"),
        biovol.alias("biovol_signif6"),
    )
