"""SparkSession factory tuned for the engine.

Local test runs use ``local[N]``; the same config block is what we would
ship on a real cluster (AQE on, Arrow on, UTC timestamps).  At 100 TB the
only knobs that change are shuffle partitions (sized to ~128 MB-per-task)
and executor memory — both cluster-side, not code-side.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "ifcb_data_pipeline_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # Shuffle partitions sized to the local core count; on a cluster this
        # is superseded by AQE coalescing (initialPartitionNum high, AQE trims).
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Allow shuffled-hash join where the planner's per-partition size
        # conditions hold (guide §3.1/§9 baseline).  r18 interleaved A/B
        # over the 8 join-heavy headline queries (configs alternated
        # every pass, probes matched): SHJ-allowed wins 7/8 queries,
        # sum-of-medians 11.85 → 11.03 s, sum-of-mins 10.41 → 9.40 s.
        # Results are join-semantics-identical (216/216 driver-sim after
        # the flip); the build side stays bounded by the planner's own
        # size conditions + AQE skew split, and sort-merge remains the
        # fallback whenever those don't hold.
        # FAILURE MODE AT SCALE (ADVICE r18, on record): SHJ's build-side
        # hash map does not spill, and canBuildLocalHashMap gates on
        # LOGICAL size estimates that can be badly wrong downstream of
        # filters/joins — a mis-estimate at 100 TB surfaces as an
        # executor OOM instead of a slower SMJ.  Deployments at real
        # scale should either verify estimate quality on their plans
        # (stats collected, post-filter sizes sane) or re-enable
        # preferSortMergeJoin and opt into SHJ per-query with
        # SHUFFLE_HASH hints on the joins A/B'd in OPTIMIZATION_r18.md.
        # AQE skew-split further bounds per-partition build sizes here.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
