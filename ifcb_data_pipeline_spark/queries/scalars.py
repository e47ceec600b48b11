"""SURVEY §2.8 scalar string/date/math operators.

The C1 cleaning-cascade oracle is *generated* from the same ordered step
list the Spark implementation uses (``functions.taxa._CLEAN_STEPS``), so
the two engines cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.bin_id import make_bin_id, parse_bin_id, strip_instrument
from ..functions.scalars import (
    f1_score,
    haversine_km,
    normalize_encoding,
    signif,
)
from ..functions.taxa import _CLEAN_STEPS, clean_taxa_name, species_flag
from . import register
from ._util import (
    TAXA_LABEL_SQL,
    dround,
    fan_out,
    lat_expr,
    lon_expr,
    tables,
    taxa_label_expr,
)


def _clean_cascade_sql(expr: str) -> str:
    """Build the DuckDB regexp_replace chain from _CLEAN_STEPS (RE2 uses
    ``\\1`` backrefs where Java uses ``$1``)."""
    out = expr
    for pattern, replacement in _CLEAN_STEPS:
        # DuckDB string literals are escape-free: '\bcf\b' reaches RE2
        # verbatim as a word boundary; backrefs use \1 (Java uses $1).
        pat = pattern.replace("'", "''")
        rep = replacement.replace("$1", "\\1")
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    return f"trim(str_split({out}, ',')[1])"


_RAW_LABEL = TAXA_LABEL_SQL.format(name="p_name", key="p_partkey")

C1_SQL = f"""
SELECT p_partkey,
       {_RAW_LABEL} AS raw_label,
       {_clean_cascade_sql(_RAW_LABEL)} AS cleaned
FROM part
"""


@register("c1_taxa_clean_cascade", C1_SQL, survey_ref="SURVEY §2.8 C1; Rmd:936-971")
def c1_taxa_clean_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = tables(spark, sf_dir, "part")
    raw = taxa_label_expr(F.col("p_name"), F.col("p_partkey"))
    return part.select(
        "p_partkey",
        raw.alias("raw_label"),
        clean_taxa_name(raw).alias("cleaned"),
    )


# --- C2: species-flag detection -------------------------------------------
# Reference semantics (Rmd:994-1010): CF from '-like'/'_cf_'/'_like' on the
# raw name; SPP/GRP/SP word-boundary flags APPENDED in that order (multi-
# flag labels like 'CF SPP').  Every 11th label gets a '-like' suffix so
# the CF path and flag combinations are exercised by the synthetic data.
_C2_RAW = f"(({_RAW_LABEL}) || CASE WHEN p_partkey % 11 = 0 THEN '-like' ELSE '' END)"
_C2_NORM = f"replace({_C2_RAW}, '_', ' ')"

C2_SQL = f"""
SELECT p_partkey,
       nullif(trim(
           (CASE WHEN contains({_C2_RAW}, '-like') OR contains({_C2_RAW}, '_cf_')
                      OR contains({_C2_RAW}, '_like') THEN 'CF ' ELSE '' END)
        || (CASE WHEN regexp_matches({_C2_NORM}, '\\bspp\\b') THEN 'SPP ' ELSE '' END)
        || (CASE WHEN regexp_matches({_C2_NORM}, '\\bgroup\\b') THEN 'GRP ' ELSE '' END)
        || (CASE WHEN regexp_matches({_C2_NORM}, '\\bsp\\b') THEN 'SP ' ELSE '' END)
       ), '') AS sflag
FROM part
"""


@register("c2_species_flag", C2_SQL, survey_ref="SURVEY §2.8 C2; Rmd:994-1010")
def c2_species_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = tables(spark, sf_dir, "part")
    raw = F.concat(
        taxa_label_expr(F.col("p_name"), F.col("p_partkey")),
        F.when(F.col("p_partkey") % 11 == 0, F.lit("-like")).otherwise(F.lit("")),
    )
    return part.select("p_partkey", species_flag(raw).alias("sflag"))


# --- C6/C7: bin-id round-trip parse ---------------------------------------
C6_SQL = """
WITH ids AS (
    SELECT event_id, ts::TIMESTAMP AS ts,
           ('D' || strftime(ts, '%Y%m%d') || 'T' || strftime(ts, '%H%M%S')
            || '_IFCB' || (user_id % 200)::VARCHAR) AS sample
    FROM events
)
SELECT event_id, sample,
       date_trunc('second', ts) AS parsed_ts,
       ts::DATE AS parsed_date,
       year(ts)::INT AS year, month(ts)::INT AS month, day(ts)::INT AS day,
       strftime(ts, '%H:%M:%S') AS time,
       'IFCB' || str_split(sample, '_IFCB')[2] AS ifcb_number,
       str_split(sample, '_')[1] AS sample_prefix
FROM ids
"""


@register("c6_parse_bin_id", C6_SQL, survey_ref="SURVEY §2.8 C6/C7; ingest_and_qc.R:211-214")
def c6_parse_bin_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    # per-row bin-id synthesis + parse over every event: the
    # single-row-group local source serializes this CPU-bound narrow
    # stage onto one task (profile tail r16: 8.7 s in-profile, and the
    # single task makes it hypersensitive to co-tenancy); fan_out is a
    # no-op at scale where splits >= cores (r17 profile item).
    events = fan_out(events)
    ids = events.select(
        "event_id",
        make_bin_id(F.col("ts"), F.col("user_id") % 200).alias("sample"),
    )
    parsed = ids.withColumn("p", parse_bin_id(F.col("sample")))
    return parsed.select(
        "event_id",
        "sample",
        F.col("p.timestamp").alias("parsed_ts"),
        F.col("p.date").alias("parsed_date"),
        F.col("p.year").alias("year"),
        F.col("p.month").alias("month"),
        F.col("p.day").alias("day"),
        F.col("p.time").alias("time"),
        F.col("p.ifcb_number").alias("ifcb_number"),
        strip_instrument("sample").alias("sample_prefix"),
    )


# --- C8: F1 score ----------------------------------------------------------
C8_SQL = """
SELECT p_partkey,
       CASE WHEN (p_partkey % 97) / 96.0 + (p_partkey % 89) / 88.0 = 0 THEN NULL
            ELSE floor((2 * ((p_partkey % 97) / 96.0) * ((p_partkey % 89) / 88.0)
                 / ((p_partkey % 97) / 96.0 + (p_partkey % 89) / 88.0)) * 1000000.0 + 0.5)
                 / 1000000.0
       END AS f1
FROM part
"""


@register("c8_f1_score", C8_SQL, survey_ref="SURVEY §2.8 C8; Rmd:906-909")
def c8_f1_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = tables(spark, sf_dir, "part")
    precision = (F.col("p_partkey") % 97) / 96.0
    recall = (F.col("p_partkey") % 89) / 88.0
    return part.select(
        "p_partkey", dround(f1_score(precision, recall), 6).alias("f1")
    )


# --- C9: signif (significant-digit rounding) -------------------------------
C9_SQL = """
SELECT o_orderkey,
       CASE WHEN o_totalprice = 0 THEN o_totalprice
            ELSE floor((o_totalprice / pow(10.0, floor(log10(abs(o_totalprice)))))
                       * 100.0 + 0.5) / 100.0
                 * pow(10.0, floor(log10(abs(o_totalprice))))
       END AS price_signif3
FROM orders
"""


@register("c9_signif_round", C9_SQL, survey_ref="SURVEY §2.8 C9; Rmd:1398-1443")
def c9_signif_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey", signif(F.col("o_totalprice"), 3).alias("price_signif3")
    )


# --- C10: date formatting / seasonal gate ----------------------------------
C10_SQL = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y%m%d%H%M%S') AS ts_compact,
       month(o_orderdate)::INT AS month,
       (month(o_orderdate) BETWEEN 5 AND 10) AS in_season
FROM orders
"""


@register("c10_date_format", C10_SQL, survey_ref="SURVEY §2.8 C10; hab_alert.R:314-316,410")
def c10_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyyMMddHHmmss").alias("ts_compact"),
        F.month("o_orderdate").alias("month"),
        F.month("o_orderdate").between(5, 10).alias("in_season"),
    )


# --- C11: encoding normalization -------------------------------------------
C11_SQL = """
SELECT p_partkey,
       translate(p_name || ' å ä ö µm', 'åäöÅÄÖµ\\', 'aaoAAOu/') AS normalized
FROM part
"""


@register("c11_encoding_fix", C11_SQL, survey_ref="SURVEY §2.8 C11; Rmd:862-891")
def c11_encoding_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = tables(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        normalize_encoding(F.concat(F.col("p_name"), F.lit(" å ä ö µm"))).alias(
            "normalized"
        ),
    )


# --- C12: haversine distance ----------------------------------------------
C12_SQL = """
SELECT c_custkey,
       floor((2 * 6371.0088 * asin(sqrt(
           pow(sin(radians(57.7 - (54.0 + (c_custkey % 600) / 100.0)) / 2), 2)
           + cos(radians(54.0 + (c_custkey % 600) / 100.0)) * cos(radians(57.7))
           * pow(sin(radians(11.97 - (10.0 + (c_custkey % 1200) / 100.0)) / 2), 2)
       ))) * 10000.0 + 0.5) / 10000.0 AS dist_to_gbg_km
FROM customer
"""


@register("c12_haversine", C12_SQL, survey_ref="SURVEY §2.8 C12; compare_microscopy.R:61-64")
def c12_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    (customer,) = tables(spark, sf_dir, "customer")
    dist = haversine_km(
        lat_expr(F.col("c_custkey")),
        lon_expr(F.col("c_custkey")),
        F.lit(57.7),
        F.lit(11.97),
    )
    return customer.select("c_custkey", dround(dist, 4).alias("dist_to_gbg_km"))


# --- C3: name-type classification + query extraction -----------------------
# Reference: clean_taxa_fn.R:52-94.  Synthetic cleaned names built from
# p_name in 5 shapes (direct / cf / like / multi / group) by p_partkey%5.
_W1 = "(upper(substr(str_split(p_name, ' ')[1], 1, 1)) || lower(substr(str_split(p_name, ' ')[1], 2)))"
_W2 = "lower(str_split(p_name, ' ')[2])"
_W2CAP = "(upper(substr(str_split(p_name, ' ')[2], 1, 1)) || lower(substr(str_split(p_name, ' ')[2], 2)))"
_NAME = f"""
CASE p_partkey % 5
  WHEN 0 THEN {_W1} || ' ' || {_W2}
  WHEN 1 THEN {_W1} || ' cf ' || {_W2}
  WHEN 2 THEN {_W1} || '-like'
  WHEN 3 THEN {_W1} || ' ' || {_W2CAP}
  ELSE {_W1} || ' ' || {_W2} || ' group'
END
"""

C3_SQL = f"""
WITH named AS (SELECT p_partkey, ({_NAME}) AS cleaned FROM part),
typed AS (
    SELECT p_partkey, cleaned,
           CASE
             WHEN regexp_matches(cleaned, '\\bgroup$') THEN 'group'
             WHEN regexp_matches(cleaned, '\\bcf\\b') THEN 'cf'
             WHEN regexp_matches(cleaned, '-like$') THEN 'like'
             WHEN regexp_matches(cleaned, '^[A-Z][a-z]+-[A-Z][a-z]+$')
                  OR regexp_matches(cleaned, '^[A-Z].*\\s[A-Z]') THEN 'multi'
             ELSE 'direct'
           END AS name_type
    FROM named
)
SELECT p_partkey, cleaned, name_type,
       array_to_string(
       CASE name_type
         WHEN 'cf' THEN [regexp_replace(cleaned, '\\s+cf\\s+', ' ')]
         WHEN 'like' THEN [regexp_replace(cleaned, '-like$', '')]
         WHEN 'multi' THEN
           CASE WHEN regexp_matches(cleaned, '^[A-Z][a-z]+-[A-Z][a-z]+$')
                THEN str_split(cleaned, '-')
                ELSE str_split(regexp_replace(cleaned, '\\s+([A-Z])', '|\\1', 'g'), '|')
           END
         ELSE [regexp_replace(regexp_replace(cleaned, '\\s+spp$', ''), '\\s+sp$', '')]
       END, '|') AS query_names
FROM typed
"""


@register("c3_name_type_split", C3_SQL, survey_ref="SURVEY §2.8 C3; clean_taxa_fn.R:52-94")
def c3_name_type_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.taxa import extract_query_names, name_type

    (part,) = tables(spark, sf_dir, "part")
    w = F.split(F.col("p_name"), " ")
    w1 = F.concat(
        F.upper(F.substring(w.getItem(0), 1, 1)),
        F.lower(F.expr("substring(split(p_name, ' ')[0], 2)")),
    )
    w2 = F.lower(w.getItem(1))
    w2cap = F.concat(
        F.upper(F.substring(w.getItem(1), 1, 1)),
        F.lower(F.expr("substring(split(p_name, ' ')[1], 2)")),
    )
    k = F.col("p_partkey") % 5
    cleaned = (
        F.when(k == 0, F.concat(w1, F.lit(" "), w2))
        .when(k == 1, F.concat(w1, F.lit(" cf "), w2))
        .when(k == 2, F.concat(w1, F.lit("-like")))
        .when(k == 3, F.concat(w1, F.lit(" "), w2cap))
        .otherwise(F.concat(w1, F.lit(" "), w2, F.lit(" group")))
    )
    named = part.select("p_partkey", cleaned.alias("cleaned"))
    typed = named.withColumn("name_type", name_type(F.col("cleaned")))
    # The array-valued form (functions.taxa.extract_query_names) remains the
    # operator API; the *registered* query joins to a scalar string so the
    # driver's pandas sort/hash canonicalizer can handle the column.
    return typed.withColumn(
        "query_names",
        F.array_join(extract_query_names(F.col("cleaned"), F.col("name_type")), "|"),
    )
