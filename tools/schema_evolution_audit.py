"""Schema-evolution robustness audit (round-15 evidence axis).

At 100 TB, tables evolve: ingest jobs append columns, compaction
rewrites files with different column orders, and readers that depend
on column POSITION (or pass `*` through to outputs) silently corrupt
results the day the layout shifts.  This audit proves the whole
registry is layout-independent: it copies the SF dir's parquet tables
into a temp dir with a mutated physical schema, runs every registered
query against the MUTATED tables, and compares driver-strict against
the DuckDB oracles reading the ORIGINAL tables.  Green = every query
selects its inputs by NAME and projects explicit outputs.

Mutations (``--mode``):
  extra    append a trailing ``zz_evolved_extra`` int64 column to every
           table (the additive-evolution shape; also catches any
           ``select *`` pass-through into a result)
  reorder  write each table's columns in REVERSED order (the
           compaction/rewrite shape; catches positional reads)
  both     run the audit twice, once per mode

Usage: python tools/schema_evolution_audit.py [--sf DIR] [--mode both]
Exit 0 = all compared queries green in every requested mode.
"""

from __future__ import annotations

import argparse
import pathlib
import shutil
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO / "tools"))


def _mutate(src: pathlib.Path, dst: pathlib.Path, mode: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    for p in sorted(src.glob("*.parquet")):
        t = pq.read_table(p)
        if mode == "extra":
            t = t.append_column(
                "zz_evolved_extra", pa.array([7] * t.num_rows, type=pa.int64())
            )
        elif mode == "reorder":
            t = t.select(list(reversed(t.column_names)))
        else:  # pragma: no cover - argparse restricts choices
            raise ValueError(mode)
        pq.write_table(t, dst / p.name)


def _run_mode(sf_dir: str, mode: str) -> int:
    from driver_sim import frames_match
    from ifcb_data_pipeline_spark.queries import load_all
    from ifcb_data_pipeline_spark.session import get_spark
    from oracle_harness import duckdb_connection

    reg = dict(load_all())
    spark = get_spark("schema-evolution-audit", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connection(sf_dir)  # oracle reads the ORIGINAL layout

    with tempfile.TemporaryDirectory(prefix=f"evolved_{mode}_") as tmp:
        dst = pathlib.Path(tmp)
        _mutate(pathlib.Path(sf_dir), dst, mode)
        n = good = 0
        for name, q in reg.items():
            if q.oracle is None:
                print(f"{name}: SKIP (rows-only)")
                continue
            n += 1
            try:
                ok, msg = frames_match(
                    q.fn(spark, str(dst)).toPandas(), con.sql(q.oracle).df()
                )
            except Exception as e:  # noqa: BLE001 - report and continue
                ok, msg = False, repr(e)[:300]
            if ok:
                good += 1
            else:
                print(f"{name}: FAIL [{mode}] {msg}")
        print(f"--- schema-evolution audit [{mode}] ({sf_dir}): {good}/{n} green ---")
        return 0 if good == n else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--mode", choices=["extra", "reorder", "both"], default="both")
    args = ap.parse_args()
    modes = ["extra", "reorder"] if args.mode == "both" else [args.mode]
    rc = 0
    for m in modes:
        rc |= _run_mode(args.sf, m)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
