"""t2-gate mirror: every registry query vs its DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

from ifcb_data_pipeline_spark.queries import load_all
from tests.oracle_harness import compare

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    qdef = REGISTRY[name]
    df = qdef.fn(spark, sf_dir)
    if qdef.oracle is None:
        # rows-only check (driver's weaker gate for non-SQL-expressible ops)
        n = df.count()
        assert n >= 0
        return
    ok, msg = compare(df, duck, qdef.oracle)
    assert ok, f"{name}: {msg}"
