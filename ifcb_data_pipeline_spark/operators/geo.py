"""Geospatial predicates — SURVEY §2.4 J9.

The reference computes ``ifcb_is_near_land`` / ``ifcb_is_in_basin`` /
``ifcb_which_basin`` against coastline/basin polygons
(``ifcb-data-pipeline.Rmd:722-736``; ``download_dashboard_data.R:56-63``).

Two tiers:

* :func:`tag_basins_rect` — hermetic axis-aligned basin boxes as a
  broadcast table + pure Catalyst range predicates.  This is the testable
  path (both engines compute identically) and also the right *first*
  filter at scale: a bounding-box pass prunes the vast majority of points
  before any exact geometry runs.
* :func:`tag_polygons_shapely` — exact point-in-polygon via a broadcast
  prepared-geometry STRtree inside a vectorized pandas UDF; gated behind
  an import-try because shapely does not ship in this container.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Hermetic Baltic-ish basin boxes: (name, lat_min, lat_max, lon_min, lon_max).
BASIN_BOXES: list[tuple[str, float, float, float, float]] = [
    ("Skagerrak", 57.5, 59.5, 8.0, 11.0),
    ("Kattegat", 55.5, 57.5, 10.0, 13.0),
    ("Baltic Proper", 54.0, 60.0, 13.0, 22.0),
]


def tag_basins_rect(
    points: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    boxes: list[tuple[str, float, float, float, float]] | None = None,
    near_margin: float = 0.1,
) -> DataFrame:
    """Attach ``basin`` (first matching box in list order), ``in_baltic``
    and ``near_land`` (within ``near_margin`` degrees of a box edge while
    inside it — the hermetic stand-in for the 500 m coastline buffer)."""
    boxes = boxes or BASIN_BOXES
    lat, lon = F.col(lat_col), F.col(lon_col)
    basin = F.lit(None).cast("string")
    near = F.lit(False)
    # Fold in reverse so the first listed box wins ties.
    for name, lat0, lat1, lon0, lon1 in reversed(boxes):
        inside = (lat >= lat0) & (lat <= lat1) & (lon >= lon0) & (lon <= lon1)
        edge = inside & (
            (lat - lat0 < near_margin)
            | (lat1 - lat < near_margin)
            | (lon - lon0 < near_margin)
            | (lon1 - lon < near_margin)
        )
        basin = F.when(inside, F.lit(name)).otherwise(basin)
        near = F.when(inside, edge).otherwise(near)
    return points.withColumn("basin", basin).withColumn(
        "in_baltic", basin == "Baltic Proper"
    ).withColumn("near_land", near)


def tag_polygons_shapely(
    points: DataFrame,
    polygons_wkt: list[tuple[str, str]],
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Exact point-in-polygon via broadcast shapely STRtree (vectorized
    pandas UDF).  Raises ImportError where shapely is unavailable."""
    import pandas as pd  # noqa: F401
    from shapely import STRtree, from_wkt  # noqa: F401  (absent in container)

    names = [n for n, _ in polygons_wkt]
    geoms = [from_wkt(w) for _, w in polygons_wkt]
    tree = STRtree(geoms)

    @F.pandas_udf("string")
    def which_polygon(lat: "pd.Series", lon: "pd.Series") -> "pd.Series":
        from shapely import points as mk_points

        pts = mk_points(list(zip(lon, lat)))
        out = []
        for p in pts:
            hits = tree.query(p, predicate="within")
            out.append(names[hits[0]] if len(hits) else None)
        return pd.Series(out)

    return points.withColumn("basin", which_polygon(F.col(lat_col), F.col(lon_col)))
