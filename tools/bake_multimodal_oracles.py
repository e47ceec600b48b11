"""Regenerate the baked VALUES oracles for the kernel-chain queries
(mm2 / mm2b / mm6) from the live Spark chain.

The kernel chain has no SQL-computable twin, so its oracles are baked
result tables (the bake contract: TWO consecutive runs must be
bit-identical before the table is accepted).  Re-run this whenever a
kernel change is *intended* to move the feature values — round 16: the
feature layer switched to the compute_features-faithful estimator
forms (cov ellipse, Heron hull, largest-blob semantics), certified
against reference-generated fixtures in
tests/test_golden_chain_parity.py.

Rewrites the ``FROM (VALUES ... ) AS t(...)`` block inside each query's
SQL constant in ``queries/multimodal.py`` in place.

Run:  python tools/bake_multimodal_oracles.py
"""

from __future__ import annotations

import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

QUERIES = {
    "mm2_real_kernel_features": "MM2_SQL",
    "mm2b_kernel_topologies": "MM2B_SQL",
    "mm6_augmentation_panel": "MM6_SQL",
}

MULTIMODAL = (
    pathlib.Path(__file__).resolve().parent.parent
    / "ifcb_data_pipeline_spark"
    / "queries"
    / "multimodal.py"
)


def _fmt(v) -> str:
    import math

    if isinstance(v, str):
        return f"'{v}'"
    if isinstance(v, bool):
        raise TypeError("unexpected bool")
    if isinstance(v, int):
        return str(v)
    f = float(v)
    if math.isnan(f):
        return "'NaN'::DOUBLE"
    return repr(f)


def main() -> None:
    from ifcb_data_pipeline_spark import queries
    from ifcb_data_pipeline_spark.session import get_spark

    spark = get_spark("bake", cpus=16)
    reg = queries.load_all()
    src = MULTIMODAL.read_text()

    for qname, const in QUERIES.items():
        rows_by_run = []
        for _ in range(2):  # bake contract: two bit-identical runs
            df = reg[qname].fn(spark, "/root/testdata/sf0.01")
            pdf = df.toPandas()
            key_cols = list(pdf.columns[:2])
            pdf = pdf.sort_values(key_cols).reset_index(drop=True)
            rows = [
                tuple(row[c] for c in pdf.columns)
                for _, row in pdf.iterrows()
            ]
            rows_by_run.append(rows)
        assert rows_by_run[0] == rows_by_run[1], f"{qname}: runs differ — not bakeable"
        rows = rows_by_run[0]
        values = ",\n".join(
            "    (" + ", ".join(_fmt(v) for v in row) + ")" for row in rows
        )
        pattern = re.compile(
            r"(FROM \(VALUES\n).*?(\n\) AS t\()", re.S
        )
        # scope the substitution to this constant's assignment block
        const_start = src.index(f"{const} = ")
        const_end = src.index('"""', src.index('"""', const_start) + 3)
        block = src[const_start:const_end]
        new_block, n = pattern.subn(
            lambda m: m.group(1) + values + m.group(2), block, count=1
        )
        assert n == 1, f"{qname}: VALUES block not found"
        src = src[:const_start] + new_block + src[const_end:]
        print(f"baked {qname}: {len(rows)} rows")

    MULTIMODAL.write_text(src)
    print(f"rewrote {MULTIMODAL}")


if __name__ == "__main__":
    main()
