"""Adversarial-config oracle re-verify (the r8-precedent sweep, as a tool).

The driver's correctness gate runs the default session config (AQE on,
shuffle.partitions = cpus).  A query whose floats are only
*accidentally* stable — order-dependent double sums that happen to land
off a floor boundary under one merge order — can green the gate and
still red a future round when partition counts shift.  The standing
countermeasure (rounds 8, 11, 12) is to re-run the oracle compare under
a deliberately hostile config:

    spark.sql.adaptive.enabled = false
    spark.sql.shuffle.partitions = 7

7 partitions forces *different partial-aggregate merge orders* than both
the default 32 and DuckDB's single-threaded fold; AQE off removes the
runtime coalescing that can mask them.  Bit-level agreement here is
strictly stronger evidence than the default-config gate.

Usage:
    python tools/adversarial_check.py                     # live 50-row prefix
    python tools/adversarial_check.py --full              # whole registry
    python tools/adversarial_check.py --names a1_biovolume_rollup dd20_...
    python tools/adversarial_check.py --staged r14 r15    # unregistered pools
    python tools/adversarial_check.py --sf /root/testdata/sf0.1 --names ...

Exit 0 = all compared queries bit-green; 1 = at least one mismatch
(each printed).  Rows-only entries (oracle is None) are skipped and
reported as such.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO / "tools"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    # Mutually exclusive (ADVICE r12): silently ignoring one mode flag
    # when another is present lets a user believe queries ran that never
    # did.  Exactly one of --full/--names/--staged (or none = prefix).
    mode = ap.add_mutually_exclusive_group()
    mode.add_argument("--full", action="store_true", help="whole registry")
    mode.add_argument("--names", nargs="*", default=None, help="explicit query keys")
    mode.add_argument(
        "--staged",
        nargs="*",
        default=None,
        help="unregistered pool suffixes (e.g. r14 r15): check their STAGED "
        "dicts instead of the registry",
    )
    ap.add_argument("--partitions", default="7")
    args = ap.parse_args()

    import importlib

    from pyspark.sql import SparkSession

    from driver_sim import frames_match
    from ifcb_data_pipeline_spark.queries import PREFIX_ORDER, load_all
    from oracle_harness import duckdb_connection

    reg = dict(load_all())
    if args.staged:
        reg = {}
        for suffix in args.staged:
            mod = importlib.import_module(
                f"ifcb_data_pipeline_spark.queries.staged_{suffix}"
            )
            reg.update(mod.STAGED)
        names = list(reg)
    elif args.names:
        unknown = [n for n in args.names if n not in reg]
        if unknown:
            print(f"unknown query keys: {unknown}")
            return 1
        names = list(args.names)
    elif args.full:
        names = list(reg)
    else:
        names = list(PREFIX_ORDER)

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("adversarial-check")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.shuffle.partitions", args.partitions)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connection(args.sf)

    bad: list[tuple[str, str]] = []
    n_cmp = 0
    for name in names:
        q = reg[name]
        if q.oracle is None:
            print(f"{name}: SKIP (rows-only)")
            continue
        n_cmp += 1
        try:
            ok, msg = frames_match(q.fn(spark, args.sf).toPandas(), con.sql(q.oracle).df())
        except Exception as e:  # noqa: BLE001 - report and continue
            ok, msg = False, repr(e)[:300]
        if ok:
            print(f"{name}: ok")
        else:
            bad.append((name, msg))
            print(f"{name}: FAIL {msg}")
    print(
        f"--- adversarial-check (AQE off, partitions={args.partitions}, "
        f"{args.sf}): {n_cmp - len(bad)}/{n_cmp} green ---"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
