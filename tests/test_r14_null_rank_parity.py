"""Planted-NULL cross-engine rank parity for the NULLS LAST pins.

The w13 (ADVICE r12) and w14 (ADVICE r13) rank windows pin NULLS LAST
in BOTH engines because Spark ASC defaults nulls-first while DuckDB
defaults nulls-last — but the shipped events tables contain no NULL
``ts``/``value``, so the pins were latent, proven only by inspection.
This test makes the hazard class fire: a planted events table with
NULLs in both rank keys (and duplicate values exercising the event_id
tie-break next to them) must compare driver-strict between the Spark
query and its registered oracle.  Reverting either engine's pin reds
this file (verified during construction by removing the Spark-side
``asc_nulls_last``: ranks desync and the compare fails).
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest

from ifcb_data_pipeline_spark.queries import REGISTRY, load_all
from tests.oracle_harness import compare

load_all()

PINNED = ["w13_mad_anomaly", "w14_spearman_trend"]


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """An events.parquet whose rank keys contain NULLs.

    Shape: 4 users x 8 events.  Per user: two NULL values (adjacent
    event_ids, so their tie-break order matters), one NULL ts, one
    duplicated value pair (tie-break under non-null keys), and enough
    rows that w14's HAVING n >= 2 keeps every user.
    """
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    eid = 0
    for u in range(1, 5):
        vals = [5.0, None, None, 2.5, 2.5, 9.75, 0.25, 7.0 + u]
        for i, v in enumerate(vals):
            ts = None if i == 5 else base + dt.timedelta(minutes=3 * i + u)
            rows.append(
                {
                    "event_id": eid,
                    "ts": ts,
                    "user_id": u,
                    "event_type": "click" if i % 2 else "view",
                    "value": v,
                    "props": "{}",
                }
            )
            eid += 1
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    d = tmp_path_factory.mktemp("planted_null_events")
    pdf.to_parquet(d / "events.parquet", index=False)
    return str(d)


@pytest.fixture(scope="module")
def planted_duck(planted_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW events AS"
        f" SELECT * FROM '{planted_dir}/events.parquet'"
    )
    return con


@pytest.mark.parametrize("name", PINNED)
def test_pinned_rank_query_agrees_on_planted_nulls(
    name, spark, planted_dir, planted_duck
):
    qdef = REGISTRY[name]
    ok, msg = compare(qdef.fn(spark, planted_dir), planted_duck, qdef.oracle)
    assert ok, f"{name} on planted-NULL events: {msg}"


def test_planted_table_actually_exercises_the_hazard(planted_dir):
    # guard against the plant rotting: both rank keys must contain NULLs
    pdf = pd.read_parquet(f"{planted_dir}/events.parquet")
    assert pdf["value"].isna().sum() >= 8
    assert pdf["ts"].isna().sum() >= 4
    # and duplicate non-null values exist so the event_id tie-break runs
    dup = pdf["value"].dropna()
    assert dup.duplicated().any()


def test_bucketed_pandas_kernel_keeps_null_key_group(spark):
    """_by_user_bucketed's pandas groupby must pass dropna=False: Spark's
    groupBy keeps a NULL-key group, so the pandas re-grouping inside the
    coarse-bucket kernel must too — otherwise a schema change that lets
    user_id be NULL silently drops those rows from w8/w11."""
    from ifcb_data_pipeline_spark.queries.windows_sorts import _by_user_bucketed

    df = spark.createDataFrame(
        [(None, 1, 10.0), (None, 2, 20.0), (7, 3, 30.0)],
        "user_id int, event_id int, value double",
    )

    def kernel(pdf):
        return pdf[["user_id", "event_id", "value"]]

    out = _by_user_bucketed(
        df, kernel, "user_id int, event_id int, value double"
    ).collect()
    assert len(out) == 3, out
    assert sum(1 for r in out if r["user_id"] is None) == 2
