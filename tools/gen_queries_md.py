"""Regenerate QUERIES.md, the registry index.

Run after any registry change:  python tools/gen_queries_md.py
"""

from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ifcb_data_pipeline_spark.queries import PREFIX_ORDER, REGISTRY, load_all  # noqa: E402

HEADER = """# QUERIES — registry index (auto-generated)

{n} queries; ✅ = DuckDB oracle, ◻ = rows-only gate.
Registry order = driver execution order: the first 50 entries are the
current round's driver-verified prefix (see
`queries/__init__.py::PREFIX_ORDER` for the slot-assignment rationale
and the precomputed next-round rotation plan; `tools/rotation_audit.py`
cross-checks the plan against the CORRECTNESS artifacts).

| # | query | gate | survey ref |
|---|---|---|---|
"""


def main() -> None:
    load_all()
    assert set(PREFIX_ORDER) <= set(REGISTRY), "prefix names missing from registry"
    ordered = list(PREFIX_ORDER) + [n for n in REGISTRY if n not in set(PREFIX_ORDER)]
    lines = [HEADER.format(n=len(ordered))]
    for i, name in enumerate(ordered):
        q = REGISTRY[name]
        gate = "✅" if q.oracle else "◻"
        ref = q.survey_ref or "—"
        lines.append(f"| {i} | `{name}` | {gate} | {ref} |\n")
    (REPO / "QUERIES.md").write_text("".join(lines))
    print(f"wrote QUERIES.md: {len(ordered)} queries")


if __name__ == "__main__":
    main()
