"""SURVEY §2.3 projection/filter/predicate operators.

Bin ids are synthesized from ``events`` rows via ``make_bin_id`` so the
id-keyed semantics (blacklist day-prefix matching, encoded-timestamp range
filters) run on realistic keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.bin_id import make_bin_id
from ..functions.scalars import null_if_sentinel
from ..operators.joins import prefix_blacklist_anti_join
from . import register
from ._util import dround, lat_expr, lon_expr, tables

# Shared bin-id construction (Spark + SQL twins).
BIN_ID_SQL = (
    "('D' || strftime(ts, '%Y%m%d') || 'T' || strftime(ts, '%H%M%S')"
    " || '_IFCB' || (user_id % 200)::VARCHAR)"
)


def _with_bin_id(events: DataFrame) -> DataFrame:
    return events.withColumn(
        "sample", make_bin_id(F.col("ts"), (F.col("user_id") % 200))
    )


# --- F1: column select / rename / drop -------------------------------------
F1_SQL = """
SELECT r_regionkey AS region_id, lower(r_name) AS region_name FROM region
"""


@register("f1_select_rename", F1_SQL, survey_ref="SURVEY §2.3 F1")
def f1_select_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    (region,) = tables(spark, sf_dir, "region")
    return region.select(
        F.col("r_regionkey").alias("region_id"),
        F.lower("r_name").alias("region_name"),
    )


# --- F2: GPS staleness invalidation ----------------------------------------
# Reference: Rmd:255-259 — null out lat/lon when the GPS fix is >10 min
# older than the sample timestamp.  gps fix time ≈ ts - value*20 seconds.
F2_SQL = """
SELECT event_id,
       CASE WHEN value * 20 > 600 THEN NULL
            ELSE (54.0 + (user_id % 600) / 100.0) END AS lat,
       CASE WHEN value * 20 > 600 THEN NULL
            ELSE (10.0 + (user_id % 1200) / 100.0) END AS lon,
       (value * 20 > 600) AS gps_stale
FROM events
"""


@register("f2_gps_staleness", F2_SQL, survey_ref="SURVEY §2.3 F2; Rmd:255-259")
def f2_gps_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    # The fix timestamp lags `ts` by value*20 seconds; >600 s ⇒ stale.
    stale = (F.col("value") * 20) > 600
    return events.select(
        "event_id",
        F.when(stale, None).otherwise(lat_expr(F.col("user_id"))).alias("lat"),
        F.when(stale, None).otherwise(lon_expr(F.col("user_id"))).alias("lon"),
        stale.alias("gps_stale"),
    )


# --- F3: blacklist anti-filter with day-prefix semantics -------------------
# Reference: Rmd:199-202 + data/sample_blacklist.tsv — entries are full bin
# ids or whole days (D20231205).  Blacklist: every 250th event's bin id
# (exact entries) plus day-prefix 'D20240115'.
F3_SQL = f"""
WITH ids AS (
    SELECT event_id, user_id, {BIN_ID_SQL} AS sample FROM events
), blacklist AS (
    SELECT sample FROM ids WHERE event_id % 250 = 0
    UNION ALL SELECT 'D20240115'
)
SELECT i.event_id, i.sample FROM ids i
WHERE NOT EXISTS (
    SELECT 1 FROM blacklist b
    WHERE (length(b.sample) > 9 AND i.sample = b.sample)
       OR (length(b.sample) <= 9 AND substr(i.sample, 1, 9) = b.sample)
)
"""


@register("f3_blacklist_prefix_anti", F3_SQL, survey_ref="SURVEY §2.3 F3; Rmd:199-202")
def f3_blacklist_prefix_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    ids = _with_bin_id(events).select("event_id", "sample")
    blacklist = (
        ids.where(F.col("event_id") % 250 == 0)
        .select("sample")
        .unionByName(spark.createDataFrame([("D20240115",)], ["sample"]))
    )
    return prefix_blacklist_anti_join(ids, blacklist, id_col="sample").select(
        "event_id", "sample"
    )


# --- F4: Q-flag removal filter --------------------------------------------
# Reference: Rmd:1299-1302 — drop rows whose flag contains any of the
# remove-list (case-insensitive substring).
F4_SQL = """
SELECT event_id, event_type FROM events
WHERE NOT (lower(event_type) LIKE '%err%' OR lower(event_type) LIKE '%sign%')
"""


@register("f4_flag_removal", F4_SQL, survey_ref="SURVEY §2.3 F4; Rmd:1299-1302")
def f4_flag_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    remove = ["err", "sign"]
    cond = F.lit(False)
    for token in remove:
        cond = cond | F.lower(F.col("event_type")).contains(token)
    return events.where(~cond).select("event_id", "event_type")


# --- F7: paired value/quality QC gating ------------------------------------
# Reference: Rmd:1143-1157 — sensor value kept only when its paired quality
# flag == 1.  The quality flag lives in the props JSON (k % 4 == 1 ⇒ good).
F7_SQL = """
SELECT event_id,
       json_extract_string(props, '$.k')::INT AS q,
       CASE WHEN json_extract_string(props, '$.k')::INT % 4 = 1
            THEN value ELSE NULL END AS value_gated
FROM events
"""


@register("f7_qc_gating", F7_SQL, survey_ref="SURVEY §2.3 F7; Rmd:1143-1157")
def f7_qc_gating(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    q = F.get_json_object("props", "$.k").cast("int")
    return events.select(
        "event_id",
        q.alias("q"),
        F.when(q % 4 == 1, F.col("value")).alias("value_gated"),
    )


# --- F8: sentinel normalization -------------------------------------------
# Reference: Rmd:1333-1339 — -999 → NULL (and 0 → NULL for ph/pco2).
F8_SQL = """
SELECT event_id,
       nullif(CASE WHEN event_id % 13 = 0 THEN -999.0 ELSE value END, -999.0)
           AS value_clean,
       nullif(nullif(CASE WHEN event_id % 17 = 0 THEN 0.0 ELSE value END, -999.0), 0.0)
           AS ph_clean
FROM events
"""


@register("f8_sentinel_normalization", F8_SQL, survey_ref="SURVEY §2.3 F8; Rmd:1333-1339")
def f8_sentinel_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    raw = F.when(F.col("event_id") % 13 == 0, -999.0).otherwise(F.col("value"))
    ph_raw = F.when(F.col("event_id") % 17 == 0, 0.0).otherwise(F.col("value"))
    return events.select(
        "event_id",
        null_if_sentinel(raw, -999.0).alias("value_clean"),
        null_if_sentinel(ph_raw, -999.0, 0.0).alias("ph_clean"),
    )


# --- F10: encoded-timestamp range filter -----------------------------------
# Reference: code/list_bad_samples.R:8-15 — string-compare of encoded ids.
F10_SQL = f"""
SELECT event_id, {BIN_ID_SQL} AS sample FROM events
WHERE {BIN_ID_SQL} BETWEEN 'D20240110' AND 'D20240120'
"""


@register("f10_timestamp_range", F10_SQL, survey_ref="SURVEY §2.3 F10; list_bad_samples.R:8-15")
def f10_timestamp_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    ids = _with_bin_id(events)
    return ids.where(F.col("sample").between("D20240110", "D20240120")).select(
        "event_id", "sample"
    )


# --- F12: value-threshold filter on an aggregate ---------------------------
# Reference: code/count_pngs.R:34-41 — keep classes with image_count > 50.
F12_SQL = """
SELECT l_partkey, count(*)::BIGINT AS n FROM lineitem
GROUP BY l_partkey HAVING count(*) > 40
"""


@register("f12_value_threshold", F12_SQL, survey_ref="SURVEY §2.3 F12; count_pngs.R:34-41")
def f12_value_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 40)
    )


# --- F13: membership filters (isin small / semi-join large) ----------------
# Reference: delivery_to_shark.R:135-136; compare_microscopy.R:91.
F13_SQL = """
SELECT o_orderkey, o_orderpriority, o_orderstatus FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus = 'F'
"""


@register("f13_membership_filter", F13_SQL, survey_ref="SURVEY §2.3 F13")
def f13_membership_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    return orders.where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & (F.col("o_orderstatus") == "F")
    ).select("o_orderkey", "o_orderpriority", "o_orderstatus")
