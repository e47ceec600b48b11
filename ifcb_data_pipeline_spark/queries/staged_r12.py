"""STAGED round-12 operator candidates — NOT registered with the driver.

This module is deliberately absent from :func:`queries.load_all`'s import
list, so nothing here enters ``REGISTRY``/``PREFIX_ORDER`` or the driver's
correctness gate.  The round add throttle (≤4 registered adds per round,
VERDICT r8/r9) is already consumed for round 10 by dd18/dd19/tx15/dp12;
these four are built and locally verified NOW (oracle compare + pure-Python
recompute + 3-SF sweep in ``tests/test_staged_r12.py``) so that a future
round can register them with a one-line move each::

    # in the target module, under the round-N adds section:
    register(name, SQL, survey_ref=...)(fn)     # or re-home + @register

Ops (all "beyond reference" training-data-pipeline family, SURVEY §2.12):

* ``dd20_exact_substring_dedup`` — cross-document exact substring
  duplication (the suffix-array dedup of Lee et al. 2022, "Deduplicating
  Training Data Makes Language Models Better", re-expressed for Spark as
  stride-1 fixed-k char-gram matching + exact interval-union coverage).
* ``a28_hll_distinct_sketch`` — deterministic from-scratch HyperLogLog
  (p=6) with the exact COUNT(DISTINCT) twin and the relative error —
  the sketch-based distinct path for 100 TB, verified against truth at SF.
* ``a29_cms_heavy_hitters`` — deterministic count-min sketch (d=3, w=256)
  frequency estimation with the exact-count twin; CM's one-sided error
  (estimate ≥ truth) is a structural law the tests assert row-by-row.
* ``st9_join_state_audit`` — stream-stream join state-retention audit:
  for a candidate watermark-delay grid, how many attribution matches
  would be lost and what gap distribution the state must retain
  (the sizing companion to st4's attribution join and i11's per-event
  lateness audit).

Float policy, oracle types, and the quantized-sum/finite-decimal rules
follow ``queries/__init__`` exactly; every float output is a dround of a
value whose upstream computation is bit-identical in both engines
(ratios/divisions of exact integers or exact binary fractions, or
single-op transcendentals on exact inputs — measure-zero boundary risk).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._util import HASH32_SQL, dround, dround_sql, hash32, tables


@dataclass(frozen=True)
class StagedDef:
    fn: object
    oracle: str
    survey_ref: str = ""


STAGED: dict[str, StagedDef] = {}


def _staged(name: str, oracle: str, survey_ref: str = ""):
    def deco(fn):
        STAGED[name] = StagedDef(fn=fn, oracle=oracle, survey_ref=survey_ref)
        return fn

    return deco


# --- DD20: cross-document exact substring dedup (suffix-array twin) ---------
# Lee et al.'s ExactSubstr dedup builds a corpus-wide suffix array and
# removes any ≥50-char span that re-occurs verbatim anywhere else.  A
# suffix array is a single global sorted structure — the wrong shape for
# a 1000-executor cluster — but its MATCHES are exactly the positions
# whose fixed-k prefix gram re-occurs in another document, so the
# distributed twin is: emit every stride-1 k-char gram (k=40), keep the
# grams seen in ≥2 distinct docs (two-phase hash agg, map-side partial),
# join back (AQE picks broadcast when the dup-gram set is small — the
# common case: boilerplate is a tiny fraction of distinct grams), and
# merge per-doc position runs into an EXACT union-of-intervals char
# coverage via one doc-keyed lead() window (bounded by doc length —
# never a fat partition).  Scale shape: the only wide ops are the gram
# agg and the gram join, both on (gram) — hashable, salt-free since
# gram frequency is capped by dup-gram pruning; the explode is a
# narrow flatMap.  Cost O(total_chars), exactly the suffix-array
# work-bound, with no global sort and no driver-side structure.
DD20_SQL = r"""
WITH g AS (
    SELECT doc_id, i::BIGINT AS pos, substr(text, i::INTEGER + 1, 40) AS gram,
           length(text)::BIGINT AS n_chars
    FROM documents, unnest(range(length(text) - 39)) t(i)
    WHERE length(text) >= 40
),
dup AS (
    SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
),
d AS (
    SELECT g.doc_id, g.pos, g.n_chars FROM g JOIN dup USING (gram)
),
iv AS (
    SELECT doc_id, pos, n_chars,
           lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
    FROM d
)
SELECT doc_id,
       count(*)::BIGINT AS n_dup_positions,
       min(pos)::BIGINT AS first_pos,
       sum(CASE WHEN nxt IS NULL OR nxt - pos >= 40 THEN 40
                ELSE nxt - pos END)::BIGINT AS n_dup_chars,
       {dup_frac} AS dup_frac,
       (sum(CASE WHEN nxt IS NULL OR nxt - pos >= 40 THEN 40
                 ELSE nxt - pos END) * 5 >= max(n_chars)) AS flag_dup
FROM iv
GROUP BY doc_id
""".format(
    dup_frac=dround_sql(
        "sum(CASE WHEN nxt IS NULL OR nxt - pos >= 40 THEN 40"
        " ELSE nxt - pos END)::BIGINT * 1.0 / max(n_chars)",
        6,
    )
)


@_staged(
    "dd20_exact_substring_dedup",
    DD20_SQL,
    survey_ref="beyond reference: cross-doc exact substring duplication "
    "(Lee et al. 2022 ExactSubstr, distributed k-gram twin)",
)
def dd20_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    k = 40
    g = documents.where(F.length("text") >= k).select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.explode(F.sequence(F.lit(0), F.length("text") - k)).alias("pos"),
        "text",
    )
    grams = g.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.col("text").substr(F.col("pos") + 1, F.lit(k)).alias("gram"),
        "n_chars",
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gram")
    )
    d = grams.join(dup, "gram").select("doc_id", "pos", "n_chars")
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    iv = d.withColumn("nxt", F.lead("pos").over(wdoc))
    span = F.when(
        F.col("nxt").isNull() | (F.col("nxt") - F.col("pos") >= k), F.lit(k)
    ).otherwise(F.col("nxt") - F.col("pos"))
    return iv.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_positions"),
        F.min("pos").alias("first_pos"),
        F.sum(span).cast("long").alias("n_dup_chars"),
        dround(
            F.sum(span).cast("long") * F.lit(1.0) / F.max("n_chars"), 6
        ).alias("dup_frac"),
        (F.sum(span) * 5 >= F.max("n_chars")).alias("flag_dup"),
    )


# --- A28: deterministic HyperLogLog distinct sketch + exact twin ------------
# At 100 TB an exact per-group COUNT(DISTINCT key) is a full shuffle of
# every key; the sketch path ships m=64 one-byte registers per group
# instead.  This op implements HLL from scratch — shared md5-based
# hash32, bucket = h % 64, rho = leading-zero-count of the remaining 26
# bits + 1, register = max(rho) — so BOTH engines (and the pure-Python
# law anchor) compute the identical estimate bit-for-bit, unlike the
# engines' built-in approx_count_distinct whose internals differ.  The
# estimator is Flajolet's alpha_m * m^2 / sum(2^-M_j) with the standard
# small-range linear-counting correction (E <= 2.5m and empty buckets
# present -> m * ln(m / V)).  Exactness argument: 2^-M_j = 1.0 /
# (1::BIGINT << M_j) is an exact binary fraction, the per-group sum of
# ≤64 such terms is exact (≤ 32 significant bits) and order-insensitive,
# so the raw branch is a single IEEE division of two exact values; the
# correction branch is one ln() on an exact ratio of small ints — both
# bit-identical cross-engine, making dround(.,4) measure-zero safe.
# Scale shape: one orders scan -> (month, bucket) hash agg (map-side
# partial, ≤64 rows per group survive) -> month agg; the exact twin is
# the verification payload at SF, not part of the sketch's cost model.
_HLL_ALPHA_M2 = "2904.064"  # 0.709 * 64^2, the m=64 Flajolet constant


A28_SQL = r"""
WITH h AS (
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           {h32} AS h
    FROM orders
),
b AS (
    SELECT month, h % 64 AS bucket,
           max(CASE WHEN h // 64 = 0 THEN 27
                    ELSE 27 - length(bin(h // 64)) END) AS M
    FROM h GROUP BY month, h % 64
),
z AS (
    SELECT month,
           count(*)::BIGINT AS used,
           sum(1.0 / (1::BIGINT << M)) AS zsum
    FROM b GROUP BY month
),
e AS (
    SELECT month, used, 64 - used AS v,
           {alpha} / (zsum + (64 - used)) AS e_raw
    FROM z
),
est AS (
    SELECT month, used, v,
           CASE WHEN e_raw <= 160.0 AND v > 0
                THEN 64.0 * ln(64.0 / v) ELSE e_raw END AS e
    FROM e
),
x AS (
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           count(DISTINCT o_custkey)::BIGINT AS exact_distinct
    FROM orders GROUP BY month
)
SELECT x.month, x.exact_distinct,
       est.used AS n_buckets_used,
       {est4} AS hll_estimate,
       {err4} AS rel_err_pct
FROM x JOIN est ON x.month = est.month
""".format(
    h32=HASH32_SQL.format(x="'c' || o_custkey::VARCHAR"),
    alpha=_HLL_ALPHA_M2,
    est4=dround_sql("est.e", 4),
    err4=dround_sql("(est.e - x.exact_distinct) * 100.0 / x.exact_distinct", 4),
)


@_staged(
    "a28_hll_distinct_sketch",
    A28_SQL,
    survey_ref="beyond reference: from-scratch deterministic HyperLogLog "
    "(p=6) vs exact COUNT DISTINCT twin, per order month",
)
def a28_hll_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    month = F.date_format("o_orderdate", "yyyy-MM").alias("month")
    h = hash32(F.concat(F.lit("c"), F.col("o_custkey").cast("string")))
    # h < 2^32 << 2^53, so the double division h/64 is exact before floor
    hashed = orders.select(month, (h % 64).alias("bucket"), F.floor(h / 64).cast("long").alias("w"))
    rho = F.when(F.col("w") == 0, F.lit(27)).otherwise(
        F.lit(27) - F.length(F.bin("w"))
    )
    b = hashed.groupBy("month", "bucket").agg(F.max(rho).alias("M"))
    z = b.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("used"),
        F.sum(F.lit(1.0) / F.expr("shiftleft(1L, cast(M as int))")).alias("zsum"),
    )
    e_raw = F.lit(float(_HLL_ALPHA_M2)) / (F.col("zsum") + (F.lit(64) - F.col("used")))
    v = (F.lit(64) - F.col("used")).alias("v")
    est = z.select(
        "month",
        "used",
        v,
        F.when(
            (e_raw <= 160.0) & (F.col("used") < 64),
            F.lit(64.0) * F.log(F.lit(64.0) / (F.lit(64) - F.col("used"))),
        )
        .otherwise(e_raw)
        .alias("e"),
    )
    x = orders.groupBy(month).agg(
        F.count_distinct("o_custkey").cast("long").alias("exact_distinct")
    )
    return x.join(est, "month").select(
        "month",
        "exact_distinct",
        F.col("used").alias("n_buckets_used"),
        dround(F.col("e"), 4).alias("hll_estimate"),
        dround(
            (F.col("e") - F.col("exact_distinct"))
            * F.lit(100.0)
            / F.col("exact_distinct"),
            4,
        ).alias("rel_err_pct"),
    )


# --- A29: count-min sketch heavy hitters + exact twin -----------------------
# The CM sketch replaces a full per-key frequency table with d=3 rows of
# w=256 counters — constant state per partition, mergeable by addition,
# the classic heavy-hitter structure for unbounded key domains.  Both
# engines build the identical sketch (salted md5 hash32 per row), read
# back each key's three counters, and take the min; CM's one-sided
# guarantee (estimate >= true count, overshoot < N*e/w w.h.p.) is
# asserted per-row by the law tests.  Scale shape: counters are a
# 768-row aggregate (broadcast side); the probe explodes each distinct
# key to its 3 (row,bucket) probes and broadcast-joins — no wide join
# on raw events beyond the two hash aggs.  The exact per-key count is
# the verification twin at SF; heavy-hitter flag = est >= 1% of N,
# decided on exact integers (est * 100 >= N) so no float boundary.
A29_SQL = r"""
WITH probes AS (
    SELECT e.user_id, r.r,
           {h32} % 256 AS bucket
    FROM events e, (SELECT unnest([0, 1, 2]) AS r) r
),
counters AS (
    SELECT r, bucket, count(*)::BIGINT AS cnt
    FROM probes GROUP BY r, bucket
),
exact AS (
    SELECT user_id, count(*)::BIGINT AS n_exact FROM events GROUP BY user_id
),
keyprobe AS (
    SELECT x.user_id, r.r,
           {h32x} % 256 AS bucket
    FROM exact x, (SELECT unnest([0, 1, 2]) AS r) r
),
est AS (
    SELECT k.user_id, min(c.cnt)::BIGINT AS n_est
    FROM keyprobe k JOIN counters c ON k.r = c.r AND k.bucket = c.bucket
    GROUP BY k.user_id
),
tot AS (SELECT count(*)::BIGINT AS n FROM events)
SELECT x.user_id, x.n_exact, est.n_est,
       (est.n_est - x.n_exact)::BIGINT AS overestimate,
       (est.n_est * 100 >= tot.n) AS is_heavy_hitter
FROM exact x JOIN est ON x.user_id = est.user_id CROSS JOIN tot
""".format(
    h32=HASH32_SQL.format(x="'r' || r.r::VARCHAR || '|' || e.user_id::VARCHAR"),
    h32x=HASH32_SQL.format(x="'r' || r.r::VARCHAR || '|' || x.user_id::VARCHAR"),
)


@_staged(
    "a29_cms_heavy_hitters",
    A29_SQL,
    survey_ref="beyond reference: deterministic count-min sketch (d=3, w=256) "
    "frequency estimates + one-sided-error law vs exact counts",
)
def a29_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    rows = F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("r")

    def bucket(user_col):
        return (
            hash32(
                F.concat(
                    F.lit("r"),
                    F.col("r").cast("string"),
                    F.lit("|"),
                    user_col.cast("string"),
                )
            )
            % 256
        ).alias("bucket")

    probes = events.select("user_id", rows).select(
        "user_id", "r", bucket(F.col("user_id"))
    )
    counters = probes.groupBy("r", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    exact = events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    keyprobe = exact.select("user_id", rows).select(
        "user_id", "r", bucket(F.col("user_id"))
    )
    est = (
        keyprobe.join(F.broadcast(counters), ["r", "bucket"])
        .groupBy("user_id")
        .agg(F.min("cnt").cast("long").alias("n_est"))
    )
    tot = events.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        exact.join(est, "user_id")
        .crossJoin(F.broadcast(tot))  # 1-row broadcast side: the allowlisted
        # bounded-frame BNLJ shape, not a data-sized cartesian
        .select(
            "user_id",
            "n_exact",
            "n_est",
            (F.col("n_est") - F.col("n_exact")).cast("long").alias("overestimate"),
            (F.col("n_est") * 100 >= F.col("n")).alias("is_heavy_hitter"),
        )
    )


# --- ST9: stream-stream join state-retention audit --------------------------
# st4's view->click attribution join, run as a stream-stream join,
# keeps every view in state until the watermark passes its join window;
# the delay D is the knob that trades completeness for state size.
# This audit computes, for a candidate delay grid {60s, 180s, 600s},
# exactly which attribution pairs survive: with in-order arrival the
# state-residency a pair needs equals its event-time gap, so a pair is
# lost iff gap > D (the planted-disorder variant of this law is
# exercised by i11's anchors; the grid here sizes the knob).  Output
# per candidate delay: pair counts, loss rate, and the max/mean gap the
# state must hold — the numbers an operator reads before picking
# withWatermark().  Scale shape: ONE equi-join on user_id (hash join,
# no BNLJ — the range predicate is a post-join filter on the co-keyed
# pairs), then explode×3 over the literal grid (narrow) and a 3-group
# hash agg.  Gaps are exact BIGINT micros; ratios are int/int (dround
# safe); the 600s window bound in micros is computed in BIGINT
# (600::BIGINT * 1000000 — the INT32-overflow rule).
ST9_SQL = r"""
WITH pairs AS MATERIALIZED (
    SELECT c.user_id,
           epoch_us(c.ts::TIMESTAMP) - epoch_us(v.ts::TIMESTAMP) AS gap_us
    FROM events c JOIN events v ON c.user_id = v.user_id
    WHERE c.event_type = 'click' AND v.event_type = 'view'
      AND v.ts <= c.ts
      AND epoch_us(c.ts::TIMESTAMP) - epoch_us(v.ts::TIMESTAMP)
          < 600::BIGINT * 1000000
),
g AS (
    SELECT p.gap_us, d.delay_s
    FROM pairs p, (SELECT unnest([60, 180, 600]) AS delay_s) d
)
SELECT delay_s::BIGINT AS delay_s,
       count(*)::BIGINT AS n_pairs,
       sum(CASE WHEN gap_us <= delay_s::BIGINT * 1000000 THEN 1 ELSE 0
           END)::BIGINT AS n_retained,
       sum(CASE WHEN gap_us > delay_s::BIGINT * 1000000 THEN 1 ELSE 0
           END)::BIGINT AS n_lost,
       {loss6} AS loss_frac,
       (max(gap_us) // 1000000)::BIGINT AS max_gap_s,
       {mean4} AS mean_gap_s
FROM g GROUP BY delay_s
""".format(
    loss6=dround_sql(
        "sum(CASE WHEN gap_us > delay_s::BIGINT * 1000000 THEN 1 ELSE 0 END)"
        " * 1.0 / count(*)",
        6,
    ),
    mean4=dround_sql("sum(gap_us)::BIGINT * 1.0 / count(*) / 1000000.0", 4),
)


@_staged(
    "st9_join_state_audit",
    ST9_SQL,
    survey_ref="beyond reference (SURVEY §2.10 family): watermark-delay grid "
    "audit for the st4 stream-stream attribution join's state retention",
)
def st9_join_state_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    ev = events.select(
        "user_id", "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("us").alias("c_us")
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("us").alias("v_us")
    )
    window_us = F.lit(600).cast("long") * F.lit(1000000)
    pairs = (
        clicks.join(views, "user_id")
        .where(
            (F.col("v_us") <= F.col("c_us"))
            & (F.col("c_us") - F.col("v_us") < window_us)
        )
        .select((F.col("c_us") - F.col("v_us")).alias("gap_us"))
    )
    g = pairs.select(
        "gap_us",
        F.explode(F.array(F.lit(60), F.lit(180), F.lit(600))).alias("delay_s"),
    )
    d_us = F.col("delay_s").cast("long") * F.lit(1000000)
    lost = F.when(F.col("gap_us") > d_us, 1).otherwise(0)
    return g.groupBy(F.col("delay_s").cast("long").alias("delay_s")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(1 - lost).cast("long").alias("n_retained"),
        F.sum(lost).cast("long").alias("n_lost"),
        dround(F.sum(lost) * F.lit(1.0) / F.count(F.lit(1)), 6).alias("loss_frac"),
        F.expr("max(gap_us) div 1000000").cast("long").alias("max_gap_s"),
        dround(
            F.sum("gap_us").cast("long") * F.lit(1.0) / F.count(F.lit(1)) / F.lit(1000000.0),
            4,
        ).alias("mean_gap_s"),
    )
