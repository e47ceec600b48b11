"""Join combinators — SURVEY §2.4 J4/J5/J6 and §2.3 F3.

These are the joins the reference implements imperatively (tolerance scans,
interval lookups, positional concats) re-expressed as scale-safe DataFrame
compositions:

* :func:`asof_join` — nearest-within-tolerance time join
  (``ifcb_get_ferrybox_data(..., max_time_diff_min = 5)``,
  ``ifcb-data-pipeline.Rmd:264-297``).  Implemented as a **bucketed
  equi-join**: both sides are assigned to tolerance-width time buckets and
  the left side probes its own bucket and both neighbors — this turns the
  range join into 3 hash-join probes, shuffling on (bucket) instead of a
  full O(n·m) broadcast-nested-loop.  At 100 TB the shuffle is keyed and
  balanced; a plain range-join would degenerate to BNLJ.
* :func:`interval_join` — point-in-interval lookup
  (``ifcb_ingest_and_qc.R:216-221`` cruise intervals).  The interval table
  is broadcast (cruise tables are tiny); a broadcast nested-loop with a
  range predicate is the right physical plan.
* :func:`coalescing_fill_join` — left join + ``coalesce`` per column
  (two-tier AWS→ferrybox position fallback,
  ``ifcb-data-pipeline.Rmd:277-284``, ``ifcb_ingest_and_qc.R:295-370``).
* :func:`prefix_blacklist_anti_join` — the blacklist filter
  (``ifcb-data-pipeline.Rmd:199-202,1304-1306``) where entries may be whole
  bin ids **or day prefixes** (``D20231205``).  The reference folds the list
  into one giant regex; we anti-join on the day prefix and on the exact id,
  which stays a broadcast hash join at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str = None,
    tolerance_seconds: int = 300,
    direction: str = "nearest",
    right_prefix: str = "",
    tie_break: list[str] | None = None,
) -> DataFrame:
    """For every left row, attach the single nearest right row whose
    timestamp is within ``tolerance_seconds``; left rows with no match keep
    nulls (left-outer semantics).

    ``direction``: ``nearest`` (reference semantics), ``backward``
    (right_ts <= left_ts) or ``forward``.

    ``tie_break``: right-side columns ordering equal-distance candidates
    deterministically (required for reproducible results; the reference
    inherits file order, which Spark must not rely on).
    """
    right_ts = right_ts or left_ts
    bucket = F.lit(tolerance_seconds)

    lcols = left.columns
    # Key each left row so exactly one winner re-attaches per row even when
    # left timestamps are non-unique.  The key must be DETERMINISTIC: it is
    # referenced in two branches of the plan (candidate derivation and the
    # final re-attach join) which Spark evaluates independently, so
    # monotonically_increasing_id would silently mis-pair rows whenever the
    # upstream row order differs between evaluations (shuffle, AQE, task
    # retry).  (ts, xxhash64(all columns)) is stable under any re-execution;
    # full-row duplicates share a key and correctly receive the same match.
    lkeyed = left.withColumn(
        "__asof_id",
        F.struct(
            F.unix_timestamp(F.col(left_ts)).alias("s"),
            F.xxhash64(*[F.col(c) for c in lcols]).alias("h"),
        ),
    )
    lk = lkeyed.select(
        "__asof_id", F.unix_timestamp(F.col(left_ts)).alias("__lsec")
    ).withColumn("__lbkt", (F.col("__lsec") / bucket).cast("long"))

    r = right.select(
        F.unix_timestamp(F.col(right_ts)).alias("__rsec"),
        F.struct(*[F.col(c) for c in right.columns]).alias("__rrow"),
    ).withColumn("__rbkt", (F.col("__rsec") / bucket).cast("long"))

    # Probe own bucket plus both neighbors: any right row within tolerance
    # of a left row lives in one of the three buckets.
    probes = lk.withColumn(
        "__bkt",
        F.explode(F.array(F.col("__lbkt") - 1, F.col("__lbkt"), F.col("__lbkt") + 1)),
    )

    diff = F.col("__rsec") - F.col("__lsec")
    if direction == "backward":
        in_window = (diff <= 0) & (diff >= -tolerance_seconds)
    elif direction == "forward":
        in_window = (diff >= 0) & (diff <= tolerance_seconds)
    else:
        in_window = F.abs(diff) <= tolerance_seconds

    candidates = probes.join(r, probes["__bkt"] == r["__rbkt"], "inner").where(in_window)

    order = [F.abs(diff).asc()]
    for tb in tie_break or []:
        order.append(F.col("__rrow").getField(tb).asc())
    w = Window.partitionBy("__asof_id").orderBy(*order)
    best = (
        candidates.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("__asof_id", "__rrow")
    )

    out = lkeyed.join(best, "__asof_id", "left")
    out_cols = [F.col(c) for c in lcols] + [
        F.col("__rrow").getField(rc).alias(f"{right_prefix}{rc}") for rc in right.columns
    ]
    return out.select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    stop_col: str,
    how: str = "left",
) -> DataFrame:
    """Attach interval attributes to every point with
    ``start <= ts <= stop`` (reference: dplyr
    ``join_by(between(datetime, startdate, stopdate))``,
    ``ifcb_ingest_and_qc.R:216-221``).  Interval table is broadcast."""
    cond = (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(stop_col))
    return points.join(F.broadcast(intervals), cond, how)


def coalescing_fill_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    fill_cols: dict[str, str],
    how: str = "left",
) -> DataFrame:
    """Left join then ``coalesce(left.col, right.fallback)`` per entry in
    ``fill_cols`` (target column → right-side source column).  Chain twice
    for the reference's two-tier AWS→ferrybox fallback (J6)."""
    on = [on] if isinstance(on, str) else on
    rename = {src: f"__fill_{src}" for src in fill_cols.values()}
    r = right.select(
        *on, *[F.col(src).alias(alias) for src, alias in rename.items()]
    )
    out = left.join(r, on, how)
    for target, src in fill_cols.items():
        out = out.withColumn(target, F.coalesce(F.col(target), F.col(rename[src])))
    return out.drop(*rename.values())


def prefix_blacklist_anti_join(
    df: DataFrame,
    blacklist: DataFrame,
    id_col: str = "sample",
    blacklist_col: str = "sample",
    day_prefix_len: int = 9,
) -> DataFrame:
    """Drop rows whose id matches a blacklist entry exactly OR whose
    day-prefix (``D20231205``) matches a day-level entry.  Two broadcast
    anti-joins instead of the reference's giant alternation regex."""
    exact = blacklist.where(F.length(F.col(blacklist_col)) > day_prefix_len).select(
        F.col(blacklist_col).alias("__bl")
    )
    days = blacklist.where(F.length(F.col(blacklist_col)) <= day_prefix_len).select(
        F.col(blacklist_col).alias("__bl_day")
    )
    out = df.join(
        F.broadcast(exact), F.col(id_col) == F.col("__bl"), "left_anti"
    )
    return out.join(
        F.broadcast(days),
        F.substring(F.col(id_col), 1, day_prefix_len) == F.col("__bl_day"),
        "left_anti",
    )
