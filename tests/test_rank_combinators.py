"""Direct regression coverage for the distributed rank/prefix-sum
combinators (``operators/windows.py``) — the machinery behind
o1/dp8/tp4/sp6/o9.

Round-6 incident: the pid-stamped range frame was consumed by two plan
branches; when the two range exchanges were not deduplicated, each
sampled its own boundaries and ``__pid`` disagreed between branches,
silently corrupting ranks (the intermittent sp6 driver red row).  The
fix materializes the frame once (``localCheckpoint``).  These tests pin
the SEMANTICS under config perturbations that change exchange planning
(AQE on/off, shuffle-partition counts) — the knobs that made the
dual-sampling hazard fire — by comparing against the obviously-correct
single-partition window forms on skewed synthetic data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ifcb_data_pipeline_spark.operators.windows import (
    global_rank,
    grouped_prefix_sum,
)

# Skewed, duplicate-free key set: one hot group holding half the rows
# plus many cold groups — the shape the two-level forms exist for.
N_ROWS = 5_000


def _synthetic(spark):
    return (
        spark.range(N_ROWS)
        .select(
            F.col("id"),
            F.when(F.col("id") % 2 == 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("g"), (F.col("id") % 97).cast("string")))
            .alias("grp"),
            # non-monotone order key with collisions across groups
            F.pmod(F.col("id") * 2654435761, F.lit(100_000)).alias("ord"),
            (F.col("id") % 13 + 1).alias("val"),
        )
        .repartition(16, "id")  # scatter input so ranges must be sampled
    )


CONFIGS = [
    {"spark.sql.adaptive.enabled": "true", "spark.sql.shuffle.partitions": "32"},
    {"spark.sql.adaptive.enabled": "false", "spark.sql.shuffle.partitions": "32"},
    {"spark.sql.adaptive.enabled": "true", "spark.sql.shuffle.partitions": "7"},
]


def _with_confs(spark, confs):
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    return old


@pytest.mark.parametrize("confs", CONFIGS)
def test_global_rank_matches_window_oracle(spark, confs):
    old = _with_confs(spark, confs)
    try:
        df = _synthetic(spark)
        got = {
            r["id"]: r["rank"]
            for r in global_rank(df, F.col("ord"), F.col("id")).collect()
        }
        want = {
            r["id"]: r["rank"]
            for r in df.withColumn(
                "rank",
                F.row_number().over(Window.orderBy("ord", "id")).cast("long"),
            ).collect()
        }
        assert got == want
    finally:
        _with_confs(spark, old)


@pytest.mark.parametrize("confs", CONFIGS)
def test_grouped_prefix_sum_matches_window_oracle(spark, confs):
    old = _with_confs(spark, confs)
    try:
        df = _synthetic(spark)
        got = {
            (r["grp"], r["id"]): r["cum"]
            for r in grouped_prefix_sum(
                df, ["grp"], ["ord", "id"], "val", out_col="cum"
            ).collect()
        }
        w = (
            Window.partitionBy("grp")
            .orderBy("ord", "id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        want = {
            (r["grp"], r["id"]): r["cum"]
            for r in df.withColumn("cum", F.sum("val").over(w)).collect()
        }
        assert got == want
    finally:
        _with_confs(spark, old)


def test_global_rank_is_repeatable(spark):
    """Five plans built from scratch must agree exactly — the round-6
    failure mode was run-to-run divergence, not a deterministic bug."""
    df = _synthetic(spark)
    runs = [
        tuple(
            sorted(
                (r["id"], r["rank"])
                for r in global_rank(df, F.col("ord"), F.col("id")).collect()
            )
        )
        for _ in range(5)
    ]
    assert all(run == runs[0] for run in runs)


def test_reliable_checkpoint_paths_match_default(spark, tmp_path):
    """VERDICT r13 item 7: the setCheckpointDir-backed reliable path is
    one flag, not a rewrite — both combinators produce bit-identical
    results under reliable=True, and the flag fails loudly when no
    checkpoint dir is configured."""
    df = _synthetic(spark)
    sc = spark.sparkContext

    # without a checkpoint dir the reliable path must refuse, not hang
    assert sc._jsc.sc().getCheckpointDir().isEmpty()
    with pytest.raises(RuntimeError, match="setCheckpointDir"):
        global_rank(df, F.col("ord"), F.col("id"), reliable=True)

    sc.setCheckpointDir(str(tmp_path / "reliable_ckpt"))
    try:
        base_rank = sorted(
            (r["id"], r["rank"])
            for r in global_rank(df, F.col("ord"), F.col("id")).collect()
        )
        rel_rank = sorted(
            (r["id"], r["rank"])
            for r in global_rank(
                df, F.col("ord"), F.col("id"), reliable=True
            ).collect()
        )
        assert rel_rank == base_rank

        base_cum = sorted(
            (r["grp"], r["id"], r["cum"])
            for r in grouped_prefix_sum(
                df, ["grp"], ["ord", "id"], "val", out_col="cum"
            ).collect()
        )
        rel_cum = sorted(
            (r["grp"], r["id"], r["cum"])
            for r in grouped_prefix_sum(
                df, ["grp"], ["ord", "id"], "val", out_col="cum", reliable=True
            ).collect()
        )
        assert rel_cum == base_cum
    finally:
        # Leave the shared session as we found it for later tests.
        # LOCAL-MODE ASSUMPTION (ADVICE r14): passing None through the
        # py4j gateway only works because local mode short-circuits the
        # non-local path-validation branch in SparkContext.setCheckpointDir;
        # if this suite ever runs non-local, give this test its own
        # SparkContext fixture instead.  tmp_path itself is pytest-managed,
        # so the checkpoint files written above are reclaimed with it.
        sc._jsc.sc().setCheckpointDir(None)
