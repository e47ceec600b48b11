"""Composed-plan tests: SHARK mapping contract, EcoTaxa export, and the
incremental ingest+QC job (SURVEY §3.1-3.2 shapes)."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from ifcb_data_pipeline_spark.plans.ecotaxa_export import (
    to_ecotaxa_rows,
    write_ecotaxa,
)
from ifcb_data_pipeline_spark.plans.ingest_qc import ingest_tick
from ifcb_data_pipeline_spark.plans.shark_mapping import (
    SHARK_COLUMNS,
    shark_mapping,
)
from ifcb_data_pipeline_spark.queries import load_all

REGISTRY = load_all()


def test_shark_mapping_contract(spark, sf_dir):
    flagship = REGISTRY["p1_shark_export"].fn(spark, sf_dir)
    shark = shark_mapping(flagship)
    assert shark.columns == SHARK_COLUMNS
    row = shark.first()
    assert row["PLATFORM_CODE"] == "IFCB" and row["ORDERER"] == "SMHI"
    assert row["MYEAR"] == row["SDATE"][:4]
    assert shark.count() == flagship.count()


def test_ecotaxa_export_double_header(spark):
    per_roi = spark.createDataFrame(
        [
            ("D20240423T115846_IFCB127", 1, 57.1, 11.2, "2024-04-23", "11:58:46",
             120.5, 900.1, "Beads"),
            ("D20240423T115846_IFCB127", 2, 57.1, 11.2, "2024-04-23", "11:58:46",
             80.0, 500.0, "Diatoms"),
        ],
        "sample string, roi_number int, lat double, lon double, sdate string,"
        " stime string, area double, biovolume double, class string",
    )
    rows = to_ecotaxa_rows(per_roi)
    assert rows.first()["img_file_name"].endswith("_00001")
    with tempfile.TemporaryDirectory() as tmp:
        out = write_ecotaxa(rows, f"{tmp}/ecotaxa")
        parts = glob.glob(os.path.join(out, "*", "part-*.csv"))
        assert len(parts) >= 2
        head = open(parts[0]).read().split("\n")[:2]
        assert head[0].startswith("img_file_name\t")
        assert head[1].startswith("[t]\t")


def test_ingest_tick_incremental(spark):
    bins = spark.createDataFrame(
        [(str(i), (i % 7) + 3) for i in range(1, 9)], "sample string, n_rois int"
    )
    with tempfile.TemporaryDirectory() as tmp:
        ckpt, out = f"{tmp}/ckpt", f"{tmp}/out"
        r1 = ingest_tick(spark, bins, ckpt, out)
        assert r1["bins"] == 8
        assert r1["rois"] == sum((i % 7) + 3 for i in range(1, 9))
        # Idempotent second tick.
        r2 = ingest_tick(spark, bins, ckpt, out)
        assert r2 == {"bins": 0, "rois": 0, "psd_flagged": 0}
        # A new delivery processes only the new bin.
        more = bins.unionByName(
            spark.createDataFrame([("99", 5)], "sample string, n_rois int")
        )
        r3 = ingest_tick(spark, more, ckpt, out)
        assert r3["bins"] == 1 and r3["rois"] == 5
        feats = spark.read.parquet(f"{out}/features")
        assert feats.count() == r1["rois"] + 5
        assert feats.select("sample").distinct().count() == 9
