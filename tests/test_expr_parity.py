"""Cross-engine expression-parity pins on seeded random data.

The whole oracle strategy rests on a handful of primitives being
BIT-IDENTICAL between Spark (JVM) and DuckDB (C++): the dround
floor-formula, the md5-derived hash32, integer-cents snapping, the
signif formula, and the nano-unit ln quantization (the tx13/a25
recipe).  The registry exercises them on corpus values; these tests pin
them on 4,000 seeded random values spanning magnitudes, so a platform
or engine upgrade that breaks the contract fails loudly here instead of
as a mysterious red driver row.

Seeded (not hypothesis-random) so a pass is a permanent pass — the
measure-zero boundary argument only protects fixed inputs.
"""

from __future__ import annotations

import hashlib
import math
import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ifcb_data_pipeline_spark.queries._util import dround, dround_sql, hash32

_N = 4000


@pytest.fixture(scope="module")
def values():
    rng = random.Random(20260815)
    vals = []
    for _ in range(_N):
        mag = rng.uniform(-6, 9)
        vals.append(rng.choice([-1.0, 1.0]) * rng.random() * 10.0**mag)
    return vals


def _spark_col(spark, vals, col):
    pdf = pd.DataFrame({"x": vals})
    return [r["y"] for r in spark.createDataFrame(pdf).select(col.alias("y")).collect()]


def _duck(vals, expr):
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": vals}))
    return [r[0] for r in con.execute(f"SELECT {expr} FROM t").fetchall()]


@pytest.mark.parametrize("d", [2, 4, 6])
def test_dround_bit_parity(spark, values, d):
    sp = _spark_col(spark, values, dround(F.col("x"), d))
    du = _duck(values, dround_sql("x", d))
    py = [math.floor(v * 10.0**d + 0.5) / 10.0**d for v in values]
    assert sp == du == py


def test_hash32_bit_parity(spark):
    rng = random.Random(20260815)
    strs = [
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789 _-") for _ in range(rng.randint(0, 40)))
        for _ in range(_N // 4)
    ]
    pdf = pd.DataFrame({"s": strs})
    sp = [
        r["h"]
        for r in spark.createDataFrame(pdf).select(hash32(F.col("s")).alias("h")).collect()
    ]
    con = duckdb.connect()
    con.register("t", pdf)
    du = [
        r[0]
        for r in con.execute(
            "SELECT ('0x' || substr(md5(s), 1, 8))::BIGINT FROM t"
        ).fetchall()
    ]
    py = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in strs]
    assert sp == du == py
    # contract: 32-bit non-negative
    assert all(0 <= h < 2**32 for h in sp)


def test_integer_cents_snap_parity(spark, values):
    # 2-decimal literals snap to exact integer cents in both engines
    two_dec = [round(abs(v) % 100000, 2) for v in values]
    col = F.floor(F.col("x") * 100.0 + F.lit(0.5)).cast("long")
    sp = _spark_col(spark, two_dec, col)
    du = _duck(two_dec, "floor(x * 100.0 + 0.5)::BIGINT")
    py = [int(math.floor(v * 100.0 + 0.5)) for v in two_dec]
    assert sp == du == py
    # and the snap really inverts the literal
    assert all(abs(c / 100.0 - v) < 5e-3 for c, v in zip(py, two_dec))


def test_signif3_formula_parity_above_one(spark, values):
    # Parity domain: x >= 1 (where c9's order prices live).  Below 1 the
    # formula multiplies by pow(10, negative-integer) and JVM Math.pow
    # differs from C libm by one ulp at some exponents — see the
    # companion divergence pin below.
    pos = [abs(v) % 1e9 + 1.0 for v in values]
    mag = F.floor(F.log10(F.abs(F.col("x"))))
    col = F.floor(F.col("x") / F.pow(F.lit(10.0), mag) * 100.0 + F.lit(0.5)) / 100.0 * F.pow(
        F.lit(10.0), mag
    )
    sp = _spark_col(spark, pos, col)
    du = _duck(
        pos,
        "floor(x / pow(10.0, floor(log10(abs(x)))) * 100.0 + 0.5) / 100.0"
        " * pow(10.0, floor(log10(abs(x))))",
    )
    assert sp == du


def test_signif3_subunit_divergence_is_one_ulp(spark, values):
    # Discovered round 10: for x ~ 1e-5 the JVM's Math.pow(10.0, -5)
    # differs from C libm's pow by one ulp, so the signif formula is NOT
    # bit-portable below 1 — every divergence is confined to the last
    # ulp (relative < 1e-15).  This pin (a) documents the boundary so no
    # future oracle puts an unquantized signif on a sub-unit column, and
    # (b) detects a JVM/libm behavior change either way.
    pos = [abs(v) % 1.0 + 1e-6 for v in values]
    mag = F.floor(F.log10(F.abs(F.col("x"))))
    col = F.floor(F.col("x") / F.pow(F.lit(10.0), mag) * 100.0 + F.lit(0.5)) / 100.0 * F.pow(
        F.lit(10.0), mag
    )
    sp = _spark_col(spark, pos, col)
    du = _duck(
        pos,
        "floor(x / pow(10.0, floor(log10(abs(x)))) * 100.0 + 0.5) / 100.0"
        " * pow(10.0, floor(log10(abs(x))))",
    )
    for a, b in zip(sp, du):
        if a != b:
            assert abs(a - b) <= 1e-15 * max(abs(a), abs(b))


def test_nano_ln_quantization_parity(spark, values):
    # the tx13/a25 recipe: floor(ln(x)*1e9 + 0.5) as BIGINT
    pos = [abs(v) + 1e-9 for v in values]
    col = F.floor(F.log(F.col("x")) * 1000000000.0 + F.lit(0.5)).cast("long")
    sp = _spark_col(spark, pos, col)
    du = _duck(pos, "floor(ln(x) * 1000000000.0 + 0.5)::BIGINT")
    py = [int(math.floor(math.log(v) * 1e9 + 0.5)) for v in pos]
    assert sp == du == py


def test_haversine_dround4_grid_stability(spark):
    # The j8/c12 contract: the haversine sin/cos/asin chain may diverge
    # between engines in the last ulp, but after dround(·, 4) the grid
    # must absorb it.  Pin zero grid-flips on a seeded 2,000-point panel
    # spanning the pseudo-coordinate lattice's range.
    rng = random.Random(20260815)
    rows = [
        (
            54.0 + rng.random() * 6.0,
            10.0 + rng.random() * 12.0,
            54.0 + rng.random() * 6.0,
            10.0 + rng.random() * 12.0,
        )
        for _ in range(2000)
    ]
    pdf = pd.DataFrame(rows, columns=["la1", "lo1", "la2", "lo2"])
    la1, lo1, la2, lo2 = (F.col(c) for c in ["la1", "lo1", "la2", "lo2"])
    hav = (
        2.0
        * 6371.0088
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(la2 - la1) / 2), 2)
                + F.cos(F.radians(la1))
                * F.cos(F.radians(la2))
                * F.pow(F.sin(F.radians(lo2 - lo1) / 2), 2)
            )
        )
    )
    sp = [
        r["d"]
        for r in spark.createDataFrame(pdf).select(dround(hav, 4).alias("d")).collect()
    ]
    con = duckdb.connect()
    con.register("t", pdf)
    du = [
        r[0]
        for r in con.execute(
            "SELECT floor((2 * 6371.0088 * asin(sqrt("
            " pow(sin(radians(la2 - la1) / 2), 2)"
            " + cos(radians(la1)) * cos(radians(la2))"
            " * pow(sin(radians(lo2 - lo1) / 2), 2)"
            "))) * 10000.0 + 0.5) / 10000.0 FROM t"
        ).fetchall()
    ]
    assert sp == du


def test_strftime_compact_parity(spark):
    # The c6/c10 contract: DuckDB strftime('%Y%m%d%H%M%S') must equal
    # Spark date_format('yyyyMMddHHmmss') on arbitrary timestamps.
    rng = random.Random(20260815)
    base = pd.Timestamp("2020-01-01")
    stamps = [
        base + pd.Timedelta(seconds=rng.randint(0, 10 * 365 * 86400))
        for _ in range(1000)
    ]
    pdf = pd.DataFrame({"ts": stamps})
    sp = [
        r["s"]
        for r in spark.createDataFrame(pdf)
        .select(F.date_format("ts", "yyyyMMddHHmmss").alias("s"))
        .collect()
    ]
    con = duckdb.connect()
    con.register("t", pdf)
    du = [
        r[0]
        for r in con.execute("SELECT strftime(ts, '%Y%m%d%H%M%S') FROM t").fetchall()
    ]
    assert sp == du
