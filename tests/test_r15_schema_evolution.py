"""In-suite schema-evolution robustness check (subset of the full audit).

``tools/schema_evolution_audit.py`` proves the whole registry
layout-independent (216/216 in both mutation modes, round 15); running
all 216 twice is too slow for the default suite, so this keeps the
hazard class firing in-suite over a representative query per family.
Spark reads MUTATED tables (extra trailing column / reversed column
order) while the oracle reads the originals — a positional read or a
``select *`` pass-through reds immediately.
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

import pytest

from ifcb_data_pipeline_spark.queries import REGISTRY, load_all
from tests.oracle_harness import compare, duckdb_connection

load_all()

_tool = Path(__file__).resolve().parent.parent / "tools" / "schema_evolution_audit.py"
_spec = importlib.util.spec_from_file_location("schema_evolution_audit", _tool)
_audit = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_audit)

SF_DIR = "/root/testdata/sf0.001"

# one per family: agg, join, window, dedup, similarity, text, plan
SUBSET = [
    "a1_biovolume_rollup",
    "j4_asof_join",
    "w1_adjacency_removal",
    "dd1_exact_dedup",
    "sim1_cosine_topk",
    "tx2_quality_score",
    "p1_shark_export",
]


@pytest.fixture(scope="module", params=["extra", "reorder"])
def mutated_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"evolved_{request.param}")
    _audit._mutate(Path(SF_DIR), d, request.param)
    return str(d)


@pytest.mark.parametrize("name", SUBSET)
def test_query_is_layout_independent(name, mutated_dir, spark):
    qdef = REGISTRY[name]
    con = duckdb_connection(SF_DIR)  # oracle reads the ORIGINAL layout
    ok, msg = compare(qdef.fn(spark, mutated_dir), con, qdef.oracle)
    assert ok, f"{name} on mutated layout {mutated_dir}: {msg}"
