"""Composed end-to-end pipeline queries (SURVEY §3 entry points)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.shark_export import shark_export
from . import register
from ._util import TAXA_LABEL_SQL, dround, lat_expr, lon_expr, tables

# The taxa-clean cascade twin is generated in queries/scalars.py; reuse it.
from .scalars import _clean_cascade_sql

_LABEL = TAXA_LABEL_SQL.format(name="p_name", key="p_partkey")

# --- P1: SHARK export flagship --------------------------------------------
P1_SQL = f"""
WITH per_roi AS (
    SELECT l.l_orderkey AS sample,
           {_clean_cascade_sql(_LABEL)} AS taxon,
           floor(l.l_extendedprice * 100.0 + 0.5)::BIGINT
               * (100 - floor(l.l_discount * 100.0 + 0.5)::BIGINT) AS vol_e4
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_quantity > 0
),
rolled AS (
    SELECT sample, taxon, count(*)::BIGINT AS counts,
           sum(vol_e4)::DOUBLE / 10000.0 AS vol_sum
    FROM per_roi GROUP BY sample, taxon
),
hdr AS (
    SELECT * FROM (
        SELECT o_orderkey AS sample, o_orderdate AS sample_date,
               o_totalprice / 1000.0 AS ml_analyzed, o_custkey,
               ((o_orderstatus = 'P')
                OR coalesce(lag(o_orderstatus = 'P')
                        OVER (ORDER BY o_orderdate, o_orderkey), FALSE)
                OR coalesce(lead(o_orderstatus = 'P')
                        OVER (ORDER BY o_orderdate, o_orderkey), FALSE)) AS qc_drop
        FROM orders
    ) WHERE NOT qc_drop
),
geo AS (
    SELECT c.c_custkey, n.n_name AS basin
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT r.sample, r.taxon, g.basin,
       strftime(h.sample_date, '%Y-%m-%d') AS sdate,
       month(h.sample_date)::INT AS month,
       (month(h.sample_date) BETWEEN 5 AND 10) AS in_season,
       r.counts,
       floor((1000.0 / h.ml_analyzed) * 10.0 + 0.5) / 10.0 AS coeff,
       floor((r.counts * 1000.0 / h.ml_analyzed) * 10.0 + 0.5) / 10.0 AS abund_per_l,
       CASE WHEN r.vol_sum = 0 THEN 0.0
            ELSE floor((r.vol_sum / pow(10.0, floor(log10(abs(r.vol_sum)))))
                       * 100000.0 + 0.5) / 100000.0
                 * pow(10.0, floor(log10(abs(r.vol_sum))))
       END AS biovol_signif6
FROM rolled r
JOIN hdr h ON r.sample = h.sample
LEFT JOIN geo g ON h.o_custkey = g.c_custkey
"""


@register("p1_shark_export", P1_SQL, survey_ref="SURVEY §3.1; Rmd stages 4-11")
def p1_shark_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, nation, part = tables(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "part"
    )
    return shark_export(lineitem, orders, customer, nation, part)


# --- P2: HAB alert ---------------------------------------------------------
# Reference: ifcb_hab_alert.R — per-taxon argmax abundance, bloom
# categorization, warning-level exceedance.  Warning level derived
# deterministically from the taxon name length.
P2_SQL = """
WITH rolled AS (
    SELECT l.l_orderkey AS sample, p.p_brand AS taxon,
           count(*)::BIGINT AS counts,
           count(*) * 1000.0 / (o.o_totalprice / 1000.0) AS counts_per_liter
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_orderkey, p.p_brand, o.o_totalprice
),
argmax AS (
    SELECT sample, taxon, counts,
           floor(counts_per_liter * 10000.0 + 0.5) / 10000.0 AS counts_per_liter
    FROM (
        SELECT *, row_number() OVER (PARTITION BY taxon
                      ORDER BY counts_per_liter DESC, sample) AS rn
        FROM rolled
    ) WHERE rn = 1
),
totals AS (
    SELECT sample, sum(counts)::BIGINT AS total_counts FROM rolled GROUP BY sample
)
SELECT a.taxon, a.sample, a.counts, a.counts_per_liter,
       ((length(a.taxon) % 3) * 40 + 40)::INT AS warning_level,
       (a.counts_per_liter > (length(a.taxon) % 3) * 40 + 40) AS exceeds_warning,
       t.total_counts,
       CASE WHEN t.total_counts > 120 THEN 'major bloom'
            WHEN t.total_counts >= 70 THEN 'bloom'
            WHEN t.total_counts >= 40 THEN 'minor bloom'
            ELSE 'no bloom' END AS bloom_category
FROM argmax a JOIN totals t ON a.sample = t.sample
"""


@register("p2_hab_alert", P2_SQL, survey_ref="SURVEY §3.3; hab_alert.R:106-153")
def p2_hab_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part, orders = tables(spark, sf_dir, "lineitem", "part", "orders")
    # Aggregate the fact table first, join orders after — the join input
    # shrinks from |lineitem| to |distinct (order, brand)| before the
    # fact×fact join (two-phase agg, then broadcast-able other side).
    counts = (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("l_orderkey").alias("sample"), F.col("p_brand").alias("taxon")
        )
        .agg(F.count(F.lit(1)).alias("counts"))
    )
    rolled = counts.join(
        orders.select(F.col("o_orderkey").alias("sample"), "o_totalprice"), "sample"
    ).withColumn(
        "counts_per_liter",
        F.col("counts") * 1000.0 / (F.col("o_totalprice") / 1000.0),
    )
    # Grouped top-1 as a struct-min AGGREGATION, not a row_number window
    # (r18, guide §2.3/§2.5): taxon is p_brand — 25 distinct values at
    # ANY scale — so a taxon-partitioned window funnels the whole rolled
    # frame through 25 tasks and sorts each, a built-in hot-key skew.
    # min(struct(-cpl, sample, counts)) is the same selection rule
    # (lexicographic struct order: largest cpl, then smallest sample —
    # IEEE negation is exact and cpl > 0, and (sample, taxon) is unique
    # in rolled so the tie-break is total), but runs as a hash aggregate
    # with map-side partial combine: each task reduces to ≤ 25 rows
    # before the exchange, and nothing is ever sorted.
    argmax = (
        rolled.groupBy("taxon")
        .agg(
            F.min(
                F.struct(
                    (-F.col("counts_per_liter")).alias("neg_cpl"),
                    F.col("sample").alias("sample"),
                    F.col("counts").alias("counts"),
                )
            ).alias("top")
        )
        .select(
            F.col("top.sample").alias("sample"),
            "taxon",
            F.col("top.counts").alias("counts"),
            dround(-F.col("top.neg_cpl"), 4).alias("counts_per_liter"),
        )
    )
    totals = rolled.groupBy("sample").agg(F.sum("counts").alias("total_counts"))
    warning = ((F.length("taxon") % 3) * 40 + 40).cast("int")
    return (
        argmax.join(totals, "sample")
        .select(
            "taxon",
            "sample",
            "counts",
            "counts_per_liter",
            warning.alias("warning_level"),
            (F.col("counts_per_liter") > warning).alias("exceeds_warning"),
            "total_counts",
            F.when(F.col("total_counts") > 120, "major bloom")
            .when(F.col("total_counts") >= 70, "bloom")
            .when(F.col("total_counts") >= 40, "minor bloom")
            .otherwise("no bloom")
            .alias("bloom_category"),
        )
    )


# --- P3: dashboard metadata assembly ---------------------------------------
# Reference: ifcb_ingest_and_qc.R:372-406 — per-bin metadata with QC flags,
# cruise tags, basin labels.
P3_SQL = """
WITH cruises AS (
    SELECT (user_id % 20)::BIGINT AS cruise_no, min(ts) AS startdate,
           min(ts) + INTERVAL 3 DAY AS stopdate
    FROM events GROUP BY 1
),
meta AS MATERIALIZED (
    SELECT e.event_id,
           ('D' || strftime(e.ts, '%Y%m%d') || 'T' || strftime(e.ts, '%H%M%S')
            || '_IFCB' || (e.user_id % 200)::VARCHAR) AS sample,
           CASE WHEN e.value * 20 > 600 THEN NULL
                ELSE (54.0 + (e.user_id % 600) / 100.0) END AS latitude,
           CASE WHEN e.value * 20 > 600 THEN NULL
                ELSE (10.0 + (e.user_id % 1200) / 100.0) END AS longitude,
           (e.event_type = 'error') AS qc_bad,
           c.cruise_no
    FROM events e
    LEFT JOIN cruises c ON e.ts >= c.startdate AND e.ts <= c.stopdate
)
SELECT event_id, sample, latitude, longitude, qc_bad, cruise_no,
       CASE WHEN latitude IS NULL THEN NULL
            ELSE 'basin_' || floor(latitude / 0.25)::BIGINT::VARCHAR
       END AS basin,
       (latitude IS NULL) AS skip
FROM meta
"""


@register("p3_dashboard_metadata", P3_SQL, survey_ref="SURVEY §3.2; ingest_and_qc.R:372-406")
def p3_dashboard_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.bin_id import make_bin_id
    from ..operators.joins import interval_join

    (events,) = tables(spark, sf_dir, "events")
    cruises = events.groupBy((F.col("user_id") % 20).alias("cruise_no")).agg(
        F.min("ts").alias("startdate"),
        (F.min("ts") + F.expr("INTERVAL 3 DAY")).alias("stopdate"),
    )
    stale = (F.col("value") * 20) > 600
    meta = events.select(
        "event_id",
        "ts",
        make_bin_id(F.col("ts"), F.col("user_id") % 200).alias("sample"),
        F.when(stale, None).otherwise(lat_expr(F.col("user_id"))).alias("latitude"),
        F.when(stale, None).otherwise(lon_expr(F.col("user_id"))).alias("longitude"),
        (F.col("event_type") == "error").alias("qc_bad"),
    )
    tagged = interval_join(meta, cruises, "ts", "startdate", "stopdate", "left")
    return tagged.select(
        "event_id",
        "sample",
        "latitude",
        "longitude",
        "qc_bad",
        "cruise_no",
        F.when(
            F.col("latitude").isNull(), F.lit(None).cast("string")
        ).otherwise(
            F.concat(F.lit("basin_"), F.floor(F.col("latitude") / 0.25).cast("string"))
        ).alias("basin"),
        F.col("latitude").isNull().alias("skip"),
    )


# --- K7: EcoTaxa export shaping (SURVEY §2.2 K7) ----------------------------
# The EcoTaxa TSV contract (plans/ecotaxa_export.py; reference
# ifcb-image-export-pipeline.Rmd:474-783): per-ROI rows shaped into the
# EcoTaxa column set, grouped one file per class, each file carrying a
# SECOND header row of format codes ([t] text / [f] float) under the
# column names.  The registry form reduces that file contract to a
# deterministic DataFrame: every value rendered as the exact string the
# TSV would contain, plus one format-code row per class folder unioned
# in as literals (line_no 0 = code row, 1 = data row).  All float→string
# rendering goes through the same floor-based fixed-decimal math in both
# engines (see _fixed_str) — native float formatting differs between
# Spark and DuckDB, integer formatting does not.  Scale: one broadcast
# dim join + a distinct over |classes|; no window, no driver loop.
def _fixed_str(col, d: int):
    """Render a non-negative double as a fixed-d-decimal string via the
    dround floor trick, so both engines produce identical text."""
    scale = 10**d
    units = F.floor(col * scale + F.lit(0.5)).cast("long")
    return F.concat(
        F.floor(units / scale).cast("long").cast("string"),
        F.lit("."),
        F.lpad((units % scale).cast("string"), d, "0"),
    )


def _fixed_str_sql(expr: str, d: int) -> str:
    scale = 10**d
    return (
        f"((floor(({expr}) * {scale}.0 + 0.5)::BIGINT // {scale})::VARCHAR"
        f" || '.' || lpad((floor(({expr}) * {scale}.0 + 0.5)::BIGINT % {scale})::VARCHAR, {d}, '0'))"
    )


_K7_LAT = "(54.0 + (o.o_custkey % 600) / 100.0)"
_K7_LON = "(10.0 + (o.o_custkey % 1200) / 100.0)"
_K7_VOL = "(l.l_extendedprice * (1 - l.l_discount))"

K7_SQL = f"""
WITH sub AS (
    SELECT l.l_orderkey AS sample, l.l_linenumber AS roi,
           o.o_custkey AS ck, o.o_orderdate AS od,
           l.l_extendedprice AS price,
           {_K7_LAT} AS lat, {_K7_LON} AS lon, {_K7_VOL} AS vol,
           p.p_brand AS class
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_orderkey % 25 = 0
),
data AS (
    SELECT class AS object_annotation_category,
           1::BIGINT AS line_no,
           sample::VARCHAR || '_' || lpad(roi::VARCHAR, 5, '0') AS img_file_name,
           sample::VARCHAR || '_' || roi::VARCHAR AS object_id,
           {_fixed_str_sql('lat', 2)} AS object_lat,
           {_fixed_str_sql('lon', 2)} AS object_lon,
           strftime(od, '%Y-%m-%d') AS object_date,
           lpad((((sample * 7 + roi * 13) % 86400) // 3600)::VARCHAR, 2, '0')
             || ':' || lpad(((((sample * 7 + roi * 13) % 86400) % 3600) // 60)::VARCHAR, 2, '0')
             || ':' || lpad((((sample * 7 + roi * 13) % 86400) % 60)::VARCHAR, 2, '0')
             AS object_time,
           {_fixed_str_sql('price', 2)} AS object_area,
           {_fixed_str_sql('vol', 4)} AS object_biovolume
    FROM sub
),
codes AS (
    SELECT DISTINCT object_annotation_category,
           0::BIGINT AS line_no,
           '[t]' AS img_file_name, '[t]' AS object_id,
           '[f]' AS object_lat, '[f]' AS object_lon,
           '[t]' AS object_date, '[t]' AS object_time,
           '[f]' AS object_area, '[f]' AS object_biovolume
    FROM data
)
SELECT * FROM data UNION ALL SELECT * FROM codes
"""


@register("k7_ecotaxa_export", K7_SQL, survey_ref="SURVEY §2.2 K7; image-export Rmd:474-783")
def k7_ecotaxa_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.ecotaxa_export import ECOTAXA_COLUMNS, to_ecotaxa_rows

    lineitem, orders, part = tables(spark, sf_dir, "lineitem", "orders", "part")
    sub = (
        lineitem.where(F.col("l_orderkey") % 25 == 0)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    secs = (F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 86400
    per_roi = sub.select(
        F.col("l_orderkey").alias("sample"),
        F.col("l_linenumber").alias("roi_number"),
        lat_expr(F.col("o_custkey")).alias("lat"),
        lon_expr(F.col("o_custkey")).alias("lon"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("sdate"),
        F.concat_ws(
            ":",
            F.lpad(F.floor(secs / 3600).cast("string"), 2, "0"),
            F.lpad(F.floor((secs % 3600) / 60).cast("string"), 2, "0"),
            F.lpad((secs % 60).cast("string"), 2, "0"),
        ).alias("stime"),
        F.col("l_extendedprice").alias("area"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("biovolume"),
        F.col("p_brand").alias("class"),
    )
    shaped = to_ecotaxa_rows(per_roi)
    data = shaped.select(
        "object_annotation_category",
        F.lit(1).cast("long").alias("line_no"),
        "img_file_name",
        "object_id",
        _fixed_str(F.col("object_lat"), 2).alias("object_lat"),
        _fixed_str(F.col("object_lon"), 2).alias("object_lon"),
        "object_date",
        "object_time",
        _fixed_str(F.col("object_area"), 2).alias("object_area"),
        _fixed_str(F.col("object_biovolume"), 4).alias("object_biovolume"),
    )
    code_by_name = dict(ECOTAXA_COLUMNS)
    codes = data.select("object_annotation_category").distinct().select(
        "object_annotation_category",
        F.lit(0).cast("long").alias("line_no"),
        *[
            F.lit(code_by_name[c]).alias(c)
            for c in data.columns
            if c not in ("object_annotation_category", "line_no")
        ],
    )
    return data.unionByName(codes)
