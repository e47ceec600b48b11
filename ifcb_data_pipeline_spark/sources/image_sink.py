"""PNG/zip image sink — SURVEY §2.2 K4.

The reference extracts annotated PNGs into per-class folders and zips
them with 500 MB size-based splitting
(``ifcb-image-export-pipeline.Rmd:124-131,843-849``).

Spark-first: image bytes are written from the executors via
``foreachPartition`` (no image data ever moves to the driver); the
size-split zip step runs per class over the already-written files.
"""

from __future__ import annotations

import os
import zipfile


def write_images_by_class(
    rois,
    out_dir: str,
    class_col: str = "class",
    name_cols: tuple[str, str] = ("sample", "roi_number"),
    image_col: str = "image",
) -> str:
    """Write each ROI's bytes to ``out_dir/<class>/<sample>_<roi>.png``
    from the executors."""
    sample_col, roi_col = name_cols

    def write_partition(rows):
        for row in rows:
            cls = row[class_col] or "unclassified"
            d = os.path.join(out_dir, cls)
            os.makedirs(d, exist_ok=True)
            name = f"{row[sample_col]}_{int(row[roi_col]):05d}.png"
            with open(os.path.join(d, name), "wb") as f:
                f.write(bytes(row[image_col]))

    rois.select(class_col, sample_col, roi_col, image_col).foreachPartition(
        write_partition
    )
    return out_dir


def zip_with_splitting(
    src_dir: str, zip_prefix: str, max_bytes: int = 500 * 1024 * 1024
) -> list[str]:
    """Zip a directory into ``<prefix>_partN.zip`` archives, starting a
    new part when the accumulated uncompressed size would exceed
    ``max_bytes`` (reference: ``split_zip=TRUE, max_size=500``)."""
    parts: list[str] = []
    current: zipfile.ZipFile | None = None
    acc = 0

    def new_part() -> zipfile.ZipFile:
        path = f"{zip_prefix}_part{len(parts) + 1}.zip"
        parts.append(path)
        return zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED)

    try:
        for root, _, files in os.walk(src_dir):
            for fname in sorted(files):
                full = os.path.join(root, fname)
                size = os.path.getsize(full)
                if current is None or (acc and acc + size > max_bytes):
                    if current is not None:
                        current.close()
                    current = new_part()
                    acc = 0
                current.write(full, os.path.relpath(full, src_dir))
                acc += size
    finally:
        if current is not None:
            current.close()
    return parts
