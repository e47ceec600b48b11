"""Export sinks — SURVEY §2.2 K1/K2/K7.

The SHARK delivery writer reproduces ``write_tsv(..., na = "")`` semantics
(``ifcb-data-pipeline.Rmd:1493-1500``): tab-separated, empty string for
null, header row, stable column order.  Delivery files are small final
aggregates, so single-file output is produced with ``coalesce(1)`` — the
upstream computation stays distributed; only the final write funnels.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def write_delivery_tsv(df: DataFrame, path: str, single_file: bool = True) -> str:
    """SHARK-style TSV: sep='\\t', nullValue='', header.  Returns the
    written file (single_file) or directory path."""
    out_dir = path + ".spark" if single_file else path
    writer = (
        df.coalesce(1) if single_file else df
    ).write.mode("overwrite").option("sep", "\t").option("nullValue", "").option(
        "emptyValue", ""
    ).option("header", "true")
    writer.csv(out_dir)
    if not single_file:
        return out_dir
    part = glob.glob(os.path.join(out_dir, "part-*.csv"))[0]
    shutil.move(part, path)
    shutil.rmtree(out_dir)
    return path


def write_partitioned_by_class(df: DataFrame, path: str, class_col: str = "class") -> str:
    """EcoTaxa-style one-directory-per-class sink (K7):
    ``partitionBy(class)`` keeps each class's rows in its own subtree."""
    df.write.mode("overwrite").partitionBy(class_col).option("sep", "\t").option(
        "header", "true"
    ).csv(path)
    return path
