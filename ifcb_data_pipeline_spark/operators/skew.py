"""Skew-mitigation combinators — SURVEY §7.3 ("a bloom day produces huge
bins").

AQE's skew-join handling covers sort-merge joins automatically; these
helpers cover the two cases it doesn't:

* :func:`salted_aggregate` — two-stage aggregation for skewed group
  keys: partial aggregate on (key, salt), final on key.  Works for any
  algebraic aggregate list (sum/count/min/max).
* :func:`salted_broadcast_join` — replicate the broadcast side per salt
  so a hot key's rows spread across ``salt_mod`` tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str | None, str, str]],
    salt_mod: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs``: output column → (source column or None for count,
    partial fn, final fn), e.g.
    ``{"n": (None, "count", "sum"), "total": ("x", "sum", "sum"),
    "mx": ("x", "max", "max")}``.
    The salt defaults to a deterministic hash of ``spark_partition_id``
    — uniform without randomness, stable under task retries.
    """
    salt = (
        salt_source
        if salt_source is not None
        else F.pmod(F.crc32(F.concat_ws("§", *keys, F.spark_partition_id())), salt_mod)
    )
    salted = df.withColumn("__salt", salt)
    partial_aggs = []
    for out, (src, pfn, _) in aggs.items():
        arg = F.lit(1) if src is None else F.col(src)
        partial_aggs.append(getattr(F, pfn)(arg).alias(f"__p_{out}"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    final_aggs = [
        getattr(F, ffn)(f"__p_{out}").alias(out)
        for out, (_, _, ffn) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_mod: int = 8,
) -> DataFrame:
    """Broadcast join with the dim side replicated per salt value, so a
    hot join key's fact rows land in ``salt_mod`` different tasks."""
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.crc32(F.concat_ws("§", on, F.spark_partition_id())), salt_mod)
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_mod - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = salted_fact.join(F.broadcast(salted_dim), [on, "__salt"])
    return out.drop("__salt")


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Raise map-side parallelism when the SOURCE's split count caps it.

    A parquet file is splittable only at row-group boundaries; the local
    testdata tables are single-row-group, so an expensive narrow stage
    downstream of the scan (explode + per-trigram hashing, tokenize)
    runs on ONE task no matter how many cores the session has.  When the
    scan's partition count is already ≥ the session parallelism — every
    realistic at-scale layout, where splits ≫ cores — this is a NO-OP
    and adds no shuffle; only a parallelism-starved scan pays one small
    round-robin exchange of the raw rows to unlock the cores.  Opt-in
    per call site (not folded into the table loader) so unchanged
    queries keep byte-identical plans across rounds.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
