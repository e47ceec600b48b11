"""T3 end-to-end: synthetic bins through ingest → features → rollup →
SHARK TSV, compared against an independent pure-Python oracle
(SURVEY §5 T3).

The miniature dataset is fully deterministic: 2 bins as .adc/.roi pairs
(byte-sliced images), a hdr-style metadata table, a class assignment per
ROI, rolled up per (sample, class) with per-liter math and written with
the reference's TSV semantics (tab sep, na='').  The expected numbers
are re-derived in plain Python from the same definitions — no Spark code
in the oracle path.
"""

from __future__ import annotations

import math
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from ifcb_data_pipeline_spark.operators.aggregates import biovolume_rollup
from ifcb_data_pipeline_spark.operators.multimodal import extract_features
from ifcb_data_pipeline_spark.sources.adc_roi import read_roi_images
from ifcb_data_pipeline_spark.sources.sinks import write_delivery_tsv

BINS = {
    "D20240501T100000_IFCB134": [(4, 3), (5, 2), (6, 4)],
    "D20240501T120000_IFCB134": [(3, 3), (8, 2)],
}
ML = {"D20240501T100000_IFCB134": 4.0, "D20240501T120000_IFCB134": 3.0}
MICRON_FACTOR = 1 / 3.4


def python_oracle() -> dict[tuple[str, str], tuple[int, float, float]]:
    """(sample, class) → (counts, biovolume_mm3, counts_per_liter) from
    first principles (mirrors the stub feature math + A1 rollup law)."""
    agg: dict[tuple[str, str], list[float]] = {}
    for sample, rois in BINS.items():
        for trig, (w, h) in enumerate(rois, start=1):
            area = w * h * 0.7
            equiv_d = math.sqrt(4.0 * area / math.pi)
            biovolume = area * equiv_d * 0.5
            cls = "Beads" if trig % 2 == 0 else "Diatoms"
            agg.setdefault((sample, cls), []).append(biovolume)
    out = {}
    for (sample, cls), vols in agg.items():
        counts = len(vols)
        mm3 = sum(v * MICRON_FACTOR**3 for v in vols) / 1e9
        out[(sample, cls)] = (
            counts,
            round(mm3, 14),
            round(counts * 1000.0 / ML[sample], 1),
        )
    return out


@pytest.fixture()
def bin_dir():
    with tempfile.TemporaryDirectory() as tmp:
        for sample, rois in BINS.items():
            blob = bytearray()
            lines = []
            offset = 0
            for trig, (w, h) in enumerate(rois, start=1):
                img = bytes((trig * 11 + i) % 256 for i in range(w * h))
                row = ["0"] * 17
                row[0], row[14], row[15], row[16] = (
                    str(trig),
                    str(w),
                    str(h),
                    str(offset),
                )
                lines.append(",".join(row))
                blob += img
                offset += len(img)
            with open(os.path.join(tmp, f"{sample}.adc"), "w") as f:
                f.write("\n".join(lines))
            with open(os.path.join(tmp, f"{sample}.roi"), "wb") as f:
                f.write(bytes(blob))
        yield tmp


def test_ingest_to_shark_tsv_golden(spark, bin_dir):
    rois = read_roi_images(spark, bin_dir)
    features = extract_features(rois)

    # Classifier output: even ROIs are Beads, odd are Diatoms.
    classes = rois.select(
        "sample",
        "roi_number",
        F.when(F.col("roi_number") % 2 == 0, "Beads")
        .otherwise("Diatoms")
        .alias("class_name"),
    )
    hdr = spark.createDataFrame(
        list(ML.items()), "sample string, ml_analyzed double"
    )
    rolled = biovolume_rollup(
        features, classes, hdr, micron_factor=MICRON_FACTOR, drop_zero_volume=True
    )

    expected = python_oracle()
    got = {
        (r["sample"], r["class_name"]): r
        for r in rolled.collect()
    }
    assert set(got) == set(expected)
    for key, (counts, mm3, cpl) in expected.items():
        r = got[key]
        assert r["counts"] == counts
        assert r["biovolume_mm3"] == pytest.approx(mm3, rel=1e-9)
        assert round(r["counts_per_liter"], 1) == cpl

    # TSV delivery semantics: header + tab separation + one row per group.
    out = rolled.select(
        "sample",
        F.col("class_name").alias("class"),
        "counts",
        F.round("counts_per_liter", 1).alias("counts_per_liter"),
    ).orderBy("sample", "class")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "data.txt")
        write_delivery_tsv(out, path)
        lines = open(path).read().strip().split("\n")
    assert lines[0] == "sample\tclass\tcounts\tcounts_per_liter"
    assert len(lines) == 1 + len(expected)
    assert lines[1].startswith("D20240501T100000_IFCB134\tBeads\t1\t")
