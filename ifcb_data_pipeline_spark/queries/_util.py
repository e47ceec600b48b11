"""Shared helpers for the query registry.

Synthetic-domain conventions used by BOTH engines (Spark expression and
DuckDB SQL must stay in lock-step — change one, change both):

* pseudo-coordinates: ``lat(k) = 54 + (k % 600) / 100.0``,
  ``lon(k) = 10 + (k % 1200) / 100.0`` — deterministic ship-track-like
  positions derived from an integer key (custkey/suppkey/user_id).
* taxa-ish labels: built from ``part.p_name`` with morphology suffixes
  attached by ``p_partkey % 7`` (see :func:`taxa_label_expr`).
* stable 32-bit hash: first 8 hex chars of md5 → BIGINT
  (Spark ``conv(substring(md5(x),1,8),16,10)``; DuckDB
  ``('0x' || substr(md5(x),1,8))::BIGINT``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    # Timestamp determinism: the driver may hand us a session with a
    # non-UTC timezone; the oracle (DuckDB) is timezone-naive UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return [load_table(spark, sf_dir, n) for n in names]


# Canonical implementation lives with the other physical-layout
# combinators in operators/skew.py (operators never import from
# queries/, so the shared-operator call sites — shingle_sets,
# explode_bins_to_rois — need it at that layer); re-exported here so
# query modules keep their one-stop `_util` import.
from ..operators.skew import fan_out  # noqa: E402,F401


def lat_expr(key: Column) -> Column:
    return F.lit(54.0) + (key % 600) / F.lit(100.0)


def lon_expr(key: Column) -> Column:
    return F.lit(10.0) + (key % 1200) / F.lit(100.0)


LAT_SQL = "(54.0 + ({k} % 600) / 100.0)"
LON_SQL = "(10.0 + ({k} % 1200) / 100.0)"


def dround(col: Column, d: int) -> Column:
    """Deterministic cross-engine rounding: ``floor(x·10^d + 0.5)/10^d`` as
    pure IEEE-double arithmetic.  Native ``round`` differs between engines
    (Spark rounds the exact binary expansion via BigDecimal HALF_UP; DuckDB
    rounds the shortest decimal representation), so values like 15139.495
    round differently.  This formula is bit-identical in both engines given
    identical inputs; pick ``d`` coarse enough that summation-order noise
    (~1e-12 relative) cannot straddle a boundary."""
    f = float(10.0**d)
    return F.floor(col * f + F.lit(0.5)) / F.lit(f)


def dround_sql(expr: str, d: int) -> str:
    """DuckDB twin of :func:`dround`."""
    f = float(10.0**d)
    return f"(floor(({expr}) * {f!r} + 0.5) / {f!r})"


def hash32(col: Column) -> Column:
    """Deterministic 32-bit integer hash shared with the oracle."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


HASH32_SQL = "(('0x' || substr(md5({x}), 1, 8))::BIGINT)"

# Morphology/qualifier suffixes used to synthesize classifier-label-like
# strings from part names (exercises the C1 cleaning cascade).
TAXA_SUFFIXES = [
    "",
    "_chain",
    "_single_cell",
    "_cf",
    "_spp",
    "_larger_than_30",
    "_group",
]


def taxa_label_expr(name: Column, key: Column) -> Column:
    """``'small ring', 3`` → ``'Small_ring_cf'`` — first letter capitalized,
    underscored, suffix chosen by ``key % 7``."""
    base = F.regexp_replace(
        F.concat(F.upper(F.substring(name, 1, 1)), F.lower(name.substr(F.lit(2), F.lit(100000)))),
        " ",
        "_",
    )
    suffix = F.element_at(F.array(*[F.lit(s) for s in TAXA_SUFFIXES]), (key % 7 + 1).cast("int"))
    return F.concat(base, suffix)


TAXA_LABEL_SQL = """
    (replace(
        upper(substr({name}, 1, 1)) || lower(substr({name}, 2)),
        ' ', '_')
     || (['', '_chain', '_single_cell', '_cf', '_spp', '_larger_than_30', '_group'])[({key} % 7) + 1])
"""
