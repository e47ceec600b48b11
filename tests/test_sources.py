"""Source/sink tests over synthetic instrument files (SURVEY §5 T3-lite)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from ifcb_data_pipeline_spark.sources.hdr import read_hdr_directory
from ifcb_data_pipeline_spark.sources.listing import (
    list_files,
    max_version_per_year,
    size_gated,
)
from ifcb_data_pipeline_spark.sources.sinks import write_delivery_tsv

HDR_TEMPLATE = """softwareVersion: 1.2.3
sampleNumber: {n}
gpsLatitude: {lat}
gpsLongitude: {lon}
gpsTimeFromFix: Apr/23/2024 11:58:40
mlAnalyzed: {ml}
runTime: 1199.6
inhibitTime: 88.2
other: junk: with: colons
"""


@pytest.fixture(scope="module")
def hdr_dir():
    with tempfile.TemporaryDirectory() as tmp:
        for i, (lat, lon, ml) in enumerate(
            [(57.1, 11.2, 4.2), (58.0, 12.5, 3.1), (55.5, 14.0, 5.0)]
        ):
            name = f"D2024042{i}T11584{i}_IFCB134.hdr"
            with open(os.path.join(tmp, name), "w") as f:
                f.write(HDR_TEMPLATE.format(n=i + 1, lat=lat, lon=lon, ml=ml))
        yield tmp


def test_read_hdr_directory(spark, hdr_dir):
    df = read_hdr_directory(spark, hdr_dir)
    rows = {r["sample"]: r for r in df.collect()}
    assert len(rows) == 3
    r0 = rows["D20240420T115840_IFCB134"]
    assert r0["gpsLatitude"] == 57.1
    assert r0["mlAnalyzed"] == 4.2
    assert r0["ifcb_number"] == "IFCB134"
    assert r0["timestamp"].year == 2024 and r0["timestamp"].second == 40
    assert r0["sampleNumber"] == 1


def test_listing_and_version_pick(spark):
    with tempfile.TemporaryDirectory() as tmp:
        for name, size in [
            ("D2023_class_v2.mat", 10),
            ("D2023_class_v5.mat", 10),
            ("D2024_class_v1.mat", 10),
            ("D2024_huge_v9.mat", 64),
        ]:
            with open(os.path.join(tmp, name), "wb") as f:
                f.write(b"x" * size)
        files = list_files(spark, tmp, "*.mat")
        assert files.count() == 4
        ok, skipped = size_gated(files, max_bytes=32)
        assert skipped.count() == 1  # the over-threshold file
        best = {
            r["year"]: r["version"]
            for r in max_version_per_year(ok).collect()
        }
        assert best == {2023: 5, 2024: 1}


def test_delivery_tsv_null_semantics(spark):
    df = spark.createDataFrame(
        [("s1", 1.5, None), ("s2", None, "flagged")],
        "sample string, value double, flag string",
    )
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "data.txt")
        write_delivery_tsv(df.orderBy("sample"), path)
        text = open(path).read()
    lines = text.strip().split("\n")
    assert lines[0] == "sample\tvalue\tflag"
    assert "s1\t1.5\t" in lines and "s2\t\tflagged" in lines


def test_delivery_note_render(spark):
    from ifcb_data_pipeline_spark.sources.delivery_note import render_template

    meta = spark.createDataFrame(
        [(2024, 123, "2024-05-01")], "year int, n_samples long, delivered string"
    )
    note = render_template(
        "SHARK delivery {year}: {n_samples} samples on {delivered}", meta
    )
    assert note == "SHARK delivery 2024: 123 samples on 2024-05-01"


def test_partitioned_class_sink(spark):
    import glob
    import tempfile

    from ifcb_data_pipeline_spark.sources.sinks import write_partitioned_by_class

    df = spark.createDataFrame(
        [("s1", "Beads", 1.0), ("s2", "Beads", 2.0), ("s3", "Diatoms", 3.0)],
        "sample string, class string, value double",
    )
    with tempfile.TemporaryDirectory() as tmp:
        out = f"{tmp}/ecotaxa"
        write_partitioned_by_class(df, out)
        dirs = sorted(
            p.split("class=")[1] for p in glob.glob(f"{out}/class=*")
        )
        assert dirs == ["Beads", "Diatoms"]


def test_sqlite_manual_annotations(spark):
    import sqlite3
    import tempfile

    from ifcb_data_pipeline_spark.operators.aggregates import last_per_group
    from ifcb_data_pipeline_spark.sources.sqlite import read_sqlite_table

    with tempfile.TemporaryDirectory() as tmp:
        db = f"{tmp}/annotations.db"
        con = sqlite3.connect(db)
        con.execute(
            "CREATE TABLE annotations (sample_name TEXT, roi_number INT,"
            " class_name TEXT, annotator TEXT, ts TEXT)"
        )
        con.executemany(
            "INSERT INTO annotations VALUES (?,?,?,?,?)",
            [
                ("b1", 1, "Beads", "anna", "2024-01-01T10:00:00"),
                ("b1", 1, "Diatoms", "bo", "2024-02-01T10:00:00"),
                ("b2", 3, "Beads", "anna", "2024-01-05T10:00:00"),
            ],
        )
        con.commit()
        con.close()
        df = read_sqlite_table(
            spark, db, "annotations",
            "sample_name string, roi_number long, class_name string,"
            " annotator string, ts string",
        )
        assert df.count() == 3
        # A8: latest annotation per sample wins.
        latest = last_per_group(df, ["sample_name"], "ts")
        got = {r["sample_name"]: r["class_name"] for r in latest.collect()}
        assert got == {"b1": "Diatoms", "b2": "Beads"}


def test_binary_scan_structure(spark):
    # The .mat/.h5 decoders need libs absent here; the scan half (file →
    # (sample, content) rows) must still work.
    import tempfile

    from ifcb_data_pipeline_spark.sources.binary_formats import _binary_scan

    with tempfile.TemporaryDirectory() as tmp:
        with open(f"{tmp}/D20240101T000000_IFCB1_class_v1.h5", "wb") as f:
            f.write(b"\x89HDF")
        files = _binary_scan(spark, tmp, "*.h5")
        row = files.first()
        assert row["sample"] == "D20240101T000000_IFCB1_class_v1"
        assert bytes(row["content"]) == b"\x89HDF"


def test_image_sink_and_zip_split(spark):
    import os
    import tempfile
    import zipfile as zf

    from ifcb_data_pipeline_spark.operators.multimodal import explode_bins_to_rois
    from ifcb_data_pipeline_spark.sources.image_sink import (
        write_images_by_class,
        zip_with_splitting,
    )

    bins = spark.createDataFrame(
        [("b1", 4), ("b2", 3)], "sample string, n_rois int"
    )
    rois = explode_bins_to_rois(bins).withColumn(
        "class", F.when(F.col("roi_number") % 2 == 0, "Beads").otherwise("Diatoms")
    )
    with tempfile.TemporaryDirectory() as tmp:
        out = write_images_by_class(rois, f"{tmp}/imgs")
        classes = sorted(os.listdir(out))
        assert classes == ["Beads", "Diatoms"]
        n_files = sum(len(os.listdir(os.path.join(out, c))) for c in classes)
        assert n_files == 7
        # Tiny max size forces multiple archive parts.
        parts = zip_with_splitting(out, f"{tmp}/archive", max_bytes=600)
        assert len(parts) > 1
        names = []
        for p in parts:
            with zf.ZipFile(p) as z:
                names.extend(z.namelist())
        assert len(names) == 7  # every image in exactly one part


def test_adc_roi_roundtrip(spark):
    """Synthesize a bin (.adc + .roi), read it back, verify every image
    slice (S2 byte-exact roundtrip)."""
    import tempfile

    from ifcb_data_pipeline_spark.sources.adc_roi import read_roi_images

    with tempfile.TemporaryDirectory() as tmp:
        blob = bytearray()
        adc_lines = []
        expected = {}
        offset = 0
        for trig, (w, h) in enumerate([(4, 3), (0, 0), (5, 2)], start=1):
            img = bytes((trig * 7 + i) % 256 for i in range(w * h))
            if w > 0:
                expected[trig] = (img, w, h)
            # v2 layout: trigger in col 0, width/height/start in 14/15/16.
            row = ["0"] * 17
            row[0] = str(trig)
            row[14], row[15], row[16] = str(w), str(h), str(offset)
            adc_lines.append(",".join(row))
            blob += img
            offset += len(img)
        sample = "D20240101T120000_IFCB134"
        with open(f"{tmp}/{sample}.adc", "w") as f:
            f.write("\n".join(adc_lines))
        with open(f"{tmp}/{sample}.roi", "wb") as f:
            f.write(bytes(blob))

        rois = read_roi_images(spark, tmp)
        got = {r["roi_number"]: r for r in rois.collect()}
        assert set(got) == set(expected)  # width-0 trigger rows dropped
        for trig, (img, w, h) in expected.items():
            r = got[trig]
            assert bytes(r["image"]) == img
            assert (r["width"], r["height"]) == (w, h)
            assert r["sample"] == sample
