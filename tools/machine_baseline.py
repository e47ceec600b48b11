#!/usr/bin/env python
"""Machine-drift baseline: fixed, code-independent probes.

Round 10's bench ran +20% over r9 and round 11's sequential-clean rerun
reproduced a near-uniform ~1.34x inflation across all 31 headline
queries INCLUDING ones whose code and pinned plans have been frozen for
3+ rounds — the signature of the *box* slowing down (hypervisor
co-tenancy, frequency/thermal policy), not of a regression.  But that
argument was inferential: nothing separated "every query got slower" from
"the machine got slower" because no code-independent yardstick existed.

This tool is that yardstick.  It measures four fixed workloads whose
cost can never change with engine code:

* ``py_spin``    — single-thread Python arithmetic loop (CPU scalar rate)
* ``sha_mt``     — hashlib.sha256 over 32 threads (parallel throughput;
                   releases the GIL, so it scales with real cores)
* ``numpy_gemm`` — 1024x1024 float64 matmul (memory+SIMD rate)
* ``spark_count``— a fixed 2e7-row range().filter().count() on a fresh
                   local[32] session (JVM + scheduler overhead probe)

Run ``python tools/machine_baseline.py [label]``: appends ONE json line
to ``MACHINE_BASELINE.jsonl`` and prints it.  Compare rounds by ratio:
if bench moved but these didn't, suspect the code; if these moved with
it, it's the machine — divide the bench delta out before reading it.
"""

from __future__ import annotations

import hashlib
import json
import pathlib
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = pathlib.Path(__file__).resolve().parent.parent


def py_spin() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i * 3 // 2
    dt = time.perf_counter() - t0
    assert x > 0
    return dt


def sha_mt(threads: int = 32) -> float:
    blob = b"x" * 1_000_000

    def work(_):
        h = b""
        for _ in range(200):
            h = hashlib.sha256(blob).digest()
        return h

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=threads) as ex:
        list(ex.map(work, range(threads)))
    return time.perf_counter() - t0


def numpy_gemm() -> float:
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.random((1024, 1024))
    b = rng.random((1024, 1024))
    a @ b  # warm
    t0 = time.perf_counter()
    for _ in range(8):
        a @ b
    return time.perf_counter() - t0


def spark_count() -> float:
    sys.path.insert(0, str(REPO))
    from ifcb_data_pipeline_spark.session import get_spark

    spark = get_spark("machine-baseline")
    df = spark.range(20_000_000).filter("id % 7 = 0")
    df.count()  # warm
    t0 = time.perf_counter()
    for _ in range(3):
        df.count()
    return time.perf_counter() - t0


def main() -> int:
    label = sys.argv[1] if len(sys.argv) > 1 else "adhoc"
    row = {
        "label": label,
        "py_spin_s": round(py_spin(), 3),
        "sha_mt32_s": round(sha_mt(), 3),
        "numpy_gemm8_s": round(numpy_gemm(), 3),
        "spark_count3_s": round(spark_count(), 3),
    }
    line = json.dumps(row)
    with open(REPO / "MACHINE_BASELINE.jsonl", "a") as f:
        f.write(line + "\n")
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
