"""SHARK delivery column mapping — SURVEY §2.8 C14 / §3.1 stage 11.

The reference populates a fixed ~60-column SHARK schema positionally
(``ifcb-data-pipeline.Rmd:1374-1444``), mixing static metadata stamps
(platform, orderer, project-by-year), renamed measures, and formatted
derivations.  Here the mapping is a declarative spec: a list of
(output_column, expression) pairs — one place to audit against the SHARK
format, applied as a single ``select`` (pure projection, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Static stamps (Rmd:1104-1110, 1374-1444 semantics).
STATIC_STAMPS: dict[str, str] = {
    "MYEAR": "",  # filled from sample date below
    "STATN": "IFCB SVEA ferrybox",
    "PLATFORM_CODE": "IFCB",
    "PROJ": "SMHI-IFCB",
    "ORDERER": "SMHI",
    "SLABO": "SMHI",
    "ALABO": "SMHI",
    "ACKR_SMP": "N",
    "METDC": "https://github.com/hasselasmhi/ifcb-features",
    "SMTYP": "IFCB",
}


def shark_mapping(flagship: DataFrame) -> DataFrame:
    """Map the flagship per-(sample, taxon) rows into the SHARK delivery
    column contract.  Input: output of ``plans.shark_export``."""
    cols: list[Column] = []
    # Keyed/derived columns.
    cols.append(F.substring("sdate", 1, 4).alias("MYEAR"))
    cols.append(F.col("sample").cast("string").alias("SMPNO"))
    cols.append(F.col("sdate").alias("SDATE"))
    cols.append(F.col("basin").alias("BASIN"))
    cols.append(F.col("taxon").alias("LATNM"))
    cols.append(F.col("counts").alias("COUNTNR"))
    cols.append(F.col("coeff").alias("COEFF"))
    cols.append(F.col("abund_per_l").alias("ABUND"))
    cols.append(F.col("biovol_signif6").alias("BIOVOL"))
    cols.append(F.col("in_season").alias("IN_SEASON"))
    # Static stamps.
    for name, value in STATIC_STAMPS.items():
        if name == "MYEAR":
            continue
        cols.append(F.lit(value).alias(name))
    return flagship.select(*cols)


SHARK_COLUMNS = [
    "MYEAR",
    "SMPNO",
    "SDATE",
    "BASIN",
    "LATNM",
    "COUNTNR",
    "COEFF",
    "ABUND",
    "BIOVOL",
    "IN_SEASON",
    *[k for k in STATIC_STAMPS if k != "MYEAR"],
]
