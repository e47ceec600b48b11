"""Oracle type-discipline lint + type-aware-mirror self-test.

Root cause of the r6/r7 driver red rows (sp6, a25): a windowed ``sum()``
left uncast in the oracle SQL is typed HUGEINT (int128) by DuckDB, which
round-trips through pandas as float64 — so the driver's type-sensitive
value-hash reds deterministically (``24.0`` vs Spark's ``24``) while
rows/schema match and a type-blind value compare stays green.  Two
defenses, both Spark-free and fast:

1. ``test_oracle_types_canonical`` — every oracle's DuckDB result types
   must lie in the canonical set {BIGINT, INTEGER, DOUBLE, VARCHAR,
   BOOLEAN, DATE, TIMESTAMP}, with an EMPTY whitelist.  HUGEINT (uncast
   integer window/group sums) and DECIMAL (decimal literals, ``1.0``,
   ``x * 0.5``) are exactly the types pandas mangles.
2. ``test_mirror_rejects_hugeint`` / ``_decimal`` — prove the harness's
   type-aware compare (oracle_harness._type_mismatches) actually reds the
   defect class: the pre-fix sp6/a25 shape (uncast windowed sum) must
   FAIL compare even when every value is numerically equal.
"""

from __future__ import annotations

import duckdb
import pytest

from ifcb_data_pipeline_spark.queries import load_all
from tests.oracle_harness import compare, duckdb_connection

SF_SMOKE = "/root/testdata/sf0.001"

CANONICAL = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP"}

REGISTRY = load_all()
_ORACLES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def duck_smoke():
    return duckdb_connection(SF_SMOKE)


@pytest.mark.parametrize("name", _ORACLES)
def test_oracle_types_canonical(name, duck_smoke):
    rel = duck_smoke.sql(REGISTRY[name].oracle)
    offenders = [
        f"{c}: {t}"
        for c, t in zip(rel.columns, (str(t) for t in rel.types))
        if t not in CANONICAL
    ]
    assert not offenders, (
        f"{name} oracle emits non-canonical DuckDB types ({offenders}); "
        "cast to ::BIGINT / ::DOUBLE in the SQL — HUGEINT/DECIMAL hash "
        "differently than Spark's int64/float64 under the driver's gate"
    )


def _tiny_spark_frame(spark):
    return spark.createDataFrame([(1, 3), (2, 7)], "k bigint, s bigint")


def test_mirror_rejects_hugeint(spark):
    """Pre-fix sp6/a25 shape: uncast windowed sum → HUGEINT → must red."""
    con = duckdb.connect()
    df = _tiny_spark_frame(spark)
    bad = """
    SELECT k::BIGINT AS k, sum(v) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS s
    FROM (VALUES (1, 3), (2, 4)) t(k, v)
    """
    ok, msg = compare(df, con, bad)
    assert not ok and "type mismatch" in msg and "HUGEINT" in msg, msg
    good = """
    SELECT k::BIGINT AS k, sum(v) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)::BIGINT AS s
    FROM (VALUES (1, 3), (2, 4)) t(k, v)
    """
    ok, msg = compare(df, con, good)
    assert ok, msg


def test_mirror_rejects_decimal(spark):
    con = duckdb.connect()
    df = spark.createDataFrame([(1, 0.5)], "k bigint, x double")
    bad = "SELECT 1::BIGINT AS k, 0.5 AS x"
    ok, msg = compare(df, con, bad)
    assert not ok and "type mismatch" in msg and "DECIMAL" in msg, msg
    good = "SELECT 1::BIGINT AS k, 0.5::DOUBLE AS x"
    ok, msg = compare(df, con, good)
    assert ok, msg
