"""STAGED round-15 operator candidates — NOT registered with the driver.

Fourth staging pool (discipline identical to ``staged_r12``/``r13``/``r14``:
absent from :func:`queries.load_all`, invisible to the driver, fully
verified in ``tests/test_staged_r15.py``, one-line registration later).

This pool completes the deterministic-sketch series (a28 HLL, a29
count-min from the r12 pool) and adds two classical statistical audits,
each with the exact twin computed in the same query:

* ``a30_bottomk_distinct_sample`` — the KMV / bottom-k distinct sketch:
  per order-month, the k=32 smallest hash values of the customer keys;
  estimate = (k−1)·2³²/h₍ₖ₎.  The THIRD distinct sketch next to a28's
  HLL on the same task — KMV is the one whose state is also a uniform
  sample of the distinct keys and which supports set-operation
  estimates, the trade-off this series documents.  Bottom-k is computed
  with the sp2b local-heads discipline: a per-(group, input-partition)
  heads window first, so the final per-group window only ever sees
  ≤ k·|partitions| rows — never a fat group partition.
* ``j18_bloom_join_prefilter`` — a from-scratch deterministic Bloom
  filter (k=3 salted md5 hashes, m=2¹⁷ bits) built over "customers with
  a 1995 order" and probed by every customer, with the exact semi-join
  twin: per nation, pass/true/false-positive accounting and the
  structural no-false-negative guarantee as a column.  This is the join
  pre-filter arithmetic engines push to the probe side at scale (the
  runtime-filter feature), made explicit and measurable.
* ``w15_ks_two_sample`` — exact two-sample Kolmogorov–Smirnov D between
  the click and view value distributions.  The finite-decimal rule
  makes it exact: values are 2-decimal, so the CDF steps live on the
  integer-cents domain, |F₁−F₂| maximization runs on the INTEGER
  cross-difference |c₁·n₂ − c₂·n₁| (exact argmax, deterministic
  tie-break at the smallest cents), and only the final D and the
  critical-value comparison touch doubles (one division; one sqrt).
* ``dp13_leading_digit_audit`` — Benford-style leading-digit profile of
  the integer cents per event type: observed share vs log₁₀(1+1/d)
  expectation and the per-digit χ² contribution — the data-quality
  fabrication screen.  Per-digit ROWS (no cross-digit float sum), so
  every float is a short deterministic chain on exact integers.

Float policy per ``queries/__init__``: int/int ratios under floor-form
dround; single-op transcendentals on exact inputs (log₁₀ of (d+1)/d,
sqrt of an exact-int ratio) are measure-zero boundary risks, the same
class a28's linear-counting ln already ships.
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


# --- A30: KMV bottom-k distinct sketch ----------------------------------------
_A30_K = 32

A30_SQL = r"""
WITH h AS (
    SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS month, {h32} AS h
    FROM orders
),
r AS (
    SELECT month, h,
           row_number() OVER (PARTITION BY month ORDER BY h) AS rn,
           count(*) OVER (PARTITION BY month) AS nh
    FROM h
),
kth AS (
    SELECT month, nh::BIGINT AS n_distinct_hashes, h AS kth_hash
    FROM r WHERE rn = {k}
),
x AS (
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           count(DISTINCT o_custkey)::BIGINT AS exact_distinct,
           count(DISTINCT {h32o})::BIGINT AS nh_all
    FROM orders GROUP BY month
),
est AS (
    SELECT x.month, x.exact_distinct,
           coalesce(k.n_distinct_hashes, x.nh_all) AS n_distinct_hashes,
           k.kth_hash,
           CASE WHEN k.kth_hash IS NOT NULL AND k.kth_hash > 0
                THEN ({k} - 1) * 4294967296.0 / k.kth_hash
                ELSE x.nh_all * 1.0 END AS e
    FROM x LEFT JOIN kth k ON x.month = k.month
)
SELECT month, exact_distinct, n_distinct_hashes, kth_hash,
       {est4} AS kmv_estimate,
       {err4} AS rel_err_pct
FROM est
""".format(
    h32=HASH32_SQL.format(x="'c' || o_custkey::VARCHAR"),
    h32o=HASH32_SQL.format(x="'c' || o_custkey::VARCHAR"),
    k=_A30_K,
    est4=dround_sql("e", 4),
    err4=dround_sql("(e - exact_distinct) * 100.0 / exact_distinct", 4),
)


@_staged(
    "a30_bottomk_distinct_sample",
    A30_SQL,
    survey_ref="beyond reference: KMV/bottom-k distinct sketch (k=32, shared "
    "md5 hash) vs exact twin per order month — the sample-bearing member of "
    "the distinct-sketch series (a28 HLL, a30 KMV)",
)
def a30_bottomk_distinct_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    month = F.date_format("o_orderdate", "yyyy-MM").alias("month")
    h = hash32(F.concat(F.lit("c"), F.col("o_custkey").cast("string")))
    # the distinct (month, hash) frame feeds the local-heads ladder AND the
    # per-month count — checkpoint so the corpus is scanned+deduped once
    d = orders.select(month, h.alias("h")).distinct().localCheckpoint()
    # sp2b local-heads discipline: per-(month, source-partition) bottom-k
    # first, so the month-keyed final window sees <= k * |partitions| rows
    # (bottom-k of a union = bottom-k of per-slice bottom-k's, so the
    # result is partitioning-invariant).
    local = d.withColumn("__pid", F.spark_partition_id())
    wloc = Window.partitionBy("month", "__pid").orderBy("h")
    heads = (
        local.withColumn("__rn", F.row_number().over(wloc))
        .where(F.col("__rn") <= _A30_K)
        .drop("__pid", "__rn")
    )
    wmon = Window.partitionBy("month").orderBy("h")
    kth = (
        heads.withColumn("rn", F.row_number().over(wmon))
        .where(F.col("rn") == _A30_K)
        .select("month", F.col("h").alias("kth_hash"))
    )
    stats = d.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("nh_all")
    )
    x = orders.groupBy(month).agg(
        F.count_distinct("o_custkey").cast("long").alias("exact_distinct")
    )
    e = F.when(
        F.col("kth_hash").isNotNull() & (F.col("kth_hash") > 0),
        F.lit(float(_A30_K - 1)) * F.lit(4294967296.0) / F.col("kth_hash"),
    ).otherwise(F.col("nh_all") * F.lit(1.0))
    return (
        x.join(stats, "month")
        .join(kth, "month", "left")
        .select(
            "month",
            "exact_distinct",
            F.col("nh_all").cast("long").alias("n_distinct_hashes"),
            "kth_hash",
            dround(e, 4).alias("kmv_estimate"),
            dround(
                (e - F.col("exact_distinct"))
                * F.lit(100.0)
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err_pct"),
        )
    )


# --- J18: Bloom-filter join pre-filter + exact twin ----------------------------
_J18_M = 131072  # 2^17 bits
_J18_HASHES = 3

J18_SQL = r"""
WITH build AS (
    SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
),
bits AS (
    SELECT DISTINCT {hb} % {m} AS bit
    FROM build, (SELECT unnest(range({kh})) AS i) i
),
probe AS (
    SELECT c.c_custkey, c.c_nationkey, i.i,
           {hp} % {m} AS bit
    FROM customer c, (SELECT unnest(range({kh})) AS i) i
),
hits AS (
    SELECT p.c_custkey, p.c_nationkey,
           (count(b.bit) = {kh}) AS bloom_pass
    FROM probe p LEFT JOIN bits b ON p.bit = b.bit
    GROUP BY p.c_custkey, p.c_nationkey
),
truth AS (
    SELECT h.c_custkey, h.c_nationkey, h.bloom_pass,
           (h.c_custkey IN (SELECT o_custkey FROM build)) AS is_true
    FROM hits h
)
SELECT c_nationkey::BIGINT AS nationkey,
       count(*)::BIGINT AS n_customers,
       sum(CASE WHEN is_true THEN 1 ELSE 0 END)::BIGINT AS n_true,
       sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END)::BIGINT AS n_pass,
       sum(CASE WHEN bloom_pass AND NOT is_true THEN 1 ELSE 0 END)::BIGINT
           AS n_false_pos,
       bool_and(bloom_pass OR NOT is_true) AS no_false_negatives,
       {fp6} AS fp_rate
FROM truth
GROUP BY c_nationkey
""".format(
    hb=HASH32_SQL.format(x="'b' || i.i::VARCHAR || '|' || o_custkey::VARCHAR"),
    hp=HASH32_SQL.format(x="'b' || i.i::VARCHAR || '|' || c_custkey::VARCHAR"),
    m=_J18_M,
    kh=_J18_HASHES,
    fp6=dround_sql(
        "CASE WHEN count(*) = sum(CASE WHEN is_true THEN 1 ELSE 0 END) THEN 0.0"
        " ELSE sum(CASE WHEN bloom_pass AND NOT is_true THEN 1 ELSE 0 END)"
        " * 1.0 / (count(*) - sum(CASE WHEN is_true THEN 1 ELSE 0 END)) END",
        6,
    ),
)


@_staged(
    "j18_bloom_join_prefilter",
    J18_SQL,
    survey_ref="beyond reference: from-scratch deterministic Bloom filter "
    "(k=3, m=2^17) as a join pre-filter, with the exact semi-join twin and "
    "the structural no-false-negative column per nation",
)
def j18_bloom_join_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, customer = tables(spark, sf_dir, "orders", "customer")
    # the build-key set feeds the bit frame AND the exact-twin probe —
    # checkpoint so orders is scanned once
    build = (
        orders.where(F.year("o_orderdate") == 1995)
        .select("o_custkey")
        .distinct()
        .localCheckpoint()
    )

    def salted_bit(key_col):
        return (
            hash32(
                F.concat(
                    F.lit("b"),
                    F.col("i").cast("string"),
                    F.lit("|"),
                    key_col.cast("string"),
                )
            )
            % _J18_M
        ).alias("bit")

    iexp = F.explode(F.sequence(F.lit(0), F.lit(_J18_HASHES - 1))).alias("i")
    # the filter itself: a <= min(3·|build|, m)-row distinct-bit frame —
    # broadcast to the probe side, exactly what a runtime filter ships
    bits = (
        build.select("o_custkey", iexp)
        .select(salted_bit(F.col("o_custkey")))
        .distinct()
    )
    # ONE customer scan: nationkey rides along through the probe explode
    probe = customer.select("c_custkey", "c_nationkey", iexp).select(
        "c_custkey", "c_nationkey", salted_bit(F.col("c_custkey"))
    )
    hits = (
        probe.join(
            F.broadcast(bits.withColumn("hit", F.lit(1))), "bit", "left"
        )
        .groupBy("c_custkey", "c_nationkey")
        .agg((F.count("hit") == _J18_HASHES).alias("bloom_pass"))
    )
    truth = hits.join(
        F.broadcast(build.withColumn("is_true0", F.lit(True))),
        hits.c_custkey == build.o_custkey,
        "left",
    ).select(
        "c_nationkey",
        "bloom_pass",
        F.coalesce("is_true0", F.lit(False)).alias("is_true"),
    )
    t1 = F.when(F.col("is_true"), 1).otherwise(0)
    p1 = F.when(F.col("bloom_pass"), 1).otherwise(0)
    fp1 = F.when(F.col("bloom_pass") & ~F.col("is_true"), 1).otherwise(0)
    return truth.groupBy(
        F.col("c_nationkey").cast("long").alias("nationkey")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(t1).cast("long").alias("n_true"),
        F.sum(p1).cast("long").alias("n_pass"),
        F.sum(fp1).cast("long").alias("n_false_pos"),
        F.bool_and(F.col("bloom_pass") | ~F.col("is_true")).alias(
            "no_false_negatives"
        ),
        dround(
            F.when(F.count(F.lit(1)) == F.sum(t1), F.lit(0.0)).otherwise(
                F.sum(fp1).cast("long")
                * F.lit(1.0)
                / (F.count(F.lit(1)) - F.sum(t1))
            ),
            6,
        ).alias("fp_rate"),
    )


# --- W15: exact two-sample Kolmogorov–Smirnov ----------------------------------
# Exactness via the finite-decimal rule: the CDF steps live on the
# integer-cents DOMAIN (bounded by the value domain, not the row count —
# the w12 counting trick), so the cumulative window runs over a
# ≤|domain|-row frame (the allowlisted bounded single-partition class),
# and the argmax of |F1−F2| is an INTEGER argmax of |c1·n2 − c2·n1|.
W15_SQL = r"""
WITH c AS (
    SELECT floor(value * 100.0 + 0.5)::BIGINT AS cents,
           CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
    FROM events WHERE event_type IN ('click', 'view')
),
g AS (
    SELECT cents,
           sum(is_a)::BIGINT AS a,
           sum(1 - is_a)::BIGINT AS b
    FROM c GROUP BY cents
),
cum AS (
    SELECT cents,
           sum(a) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS ca,
           sum(b) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cb
    FROM g
),
n AS (
    SELECT sum(is_a)::BIGINT AS n1, sum(1 - is_a)::BIGINT AS n2 FROM c
),
diff AS (
    SELECT cum.cents, abs(cum.ca * n.n2 - cum.cb * n.n1)::BIGINT AS num,
           n.n1, n.n2
    FROM cum CROSS JOIN n
),
best AS (
    SELECT min(cents)::BIGINT AS argmax_cents, max(num)::BIGINT AS max_num,
           max(n1)::BIGINT AS n1, max(n2)::BIGINT AS n2
    FROM diff WHERE num = (SELECT max(num) FROM diff)
)
SELECT n1, n2,
       {d6} AS d_stat,
       (argmax_cents * 1.0 / 100.0) AS d_location,
       (max_num * 1.0 / (n1 * n2)
        > 1.358 * sqrt((n1 + n2) * 1.0 / (n1 * n2))) AS reject_at_5pct
FROM best
""".format(
    d6=dround_sql("max_num * 1.0 / (n1 * n2)", 6),
)


@_staged(
    "w15_ks_two_sample",
    W15_SQL,
    survey_ref="beyond reference: exact two-sample KS on the integer-cents "
    "domain — integer cross-difference argmax, one division + one sqrt at "
    "the end",
)
def w15_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    # the cents frame feeds the domain counts AND the totals — one scan
    c = (
        events.where(F.col("event_type").isin("click", "view"))
        .select(
            F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_a"),
        )
        .localCheckpoint()
    )
    g = c.groupBy("cents").agg(
        F.sum("is_a").cast("long").alias("a"),
        F.sum(1 - F.col("is_a")).cast("long").alias("b"),
    )
    wc = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select(
        "cents",
        F.sum("a").over(wc).alias("ca"),
        F.sum("b").over(wc).alias("cb"),
    )
    n = c.agg(
        F.sum("is_a").cast("long").alias("n1"),
        F.sum(1 - F.col("is_a")).cast("long").alias("n2"),
    )
    diff = (
        cum.crossJoin(F.broadcast(n))  # 1-row broadcast totals
        .select(
            "cents",
            F.abs(F.col("ca") * F.col("n2") - F.col("cb") * F.col("n1"))
            .cast("long")
            .alias("num"),
            "n1",
            "n2",
        )
        # domain-bounded (<=|cents domain| rows); feeds the max AND the
        # argmax probe — materialize instead of recomputing the CDF twice
        .localCheckpoint()
    )
    # two-pass argmax without a window: max first, then filter (both tiny)
    mx = diff.agg(F.max("num").alias("mxnum"))
    best = (
        diff.join(F.broadcast(mx), diff.num == mx.mxnum)
        .agg(
            F.min("cents").cast("long").alias("argmax_cents"),
            F.max("num").cast("long").alias("max_num"),
            F.max("n1").cast("long").alias("n1"),
            F.max("n2").cast("long").alias("n2"),
        )
    )
    d_raw = F.col("max_num") * F.lit(1.0) / (F.col("n1") * F.col("n2"))
    crit = F.lit(1.358) * F.sqrt(
        (F.col("n1") + F.col("n2")) * F.lit(1.0) / (F.col("n1") * F.col("n2"))
    )
    return best.select(
        "n1",
        "n2",
        dround(d_raw, 6).alias("d_stat"),
        (F.col("argmax_cents") * F.lit(1.0) / F.lit(100.0)).alias("d_location"),
        (d_raw > crit).alias("reject_at_5pct"),
    )


# --- DP13: Benford-style leading-digit audit -----------------------------------
DP13_SQL = r"""
WITH c AS (
    SELECT event_type, floor(value * 100.0 + 0.5)::BIGINT AS cents
    FROM events
),
d AS (
    -- zero-cent rows have no leading digit (Benford is a law about
    -- nonzero magnitudes); sf0.1 contains value = 0.00 events
    SELECT event_type, substr(cents::VARCHAR, 1, 1)::BIGINT AS digit
    FROM c WHERE cents > 0
),
g AS (
    SELECT event_type, digit, count(*)::BIGINT AS observed FROM d
    GROUP BY event_type, digit
),
n AS (SELECT event_type, count(*)::BIGINT AS n FROM d GROUP BY event_type)
SELECT g.event_type, g.digit, g.observed,
       {share6} AS observed_share,
       {exp6} AS benford_expected,
       {chi4} AS chi2_contribution
FROM g JOIN n ON g.event_type = n.event_type
""".format(
    share6=dround_sql("g.observed * 1.0 / n.n", 6),
    exp6=dround_sql("log10((g.digit + 1) * 1.0 / g.digit)", 6),
    chi4=dround_sql(
        "(g.observed - n.n * log10((g.digit + 1) * 1.0 / g.digit))"
        " * (g.observed - n.n * log10((g.digit + 1) * 1.0 / g.digit))"
        " / (n.n * log10((g.digit + 1) * 1.0 / g.digit))",
        4,
    ),
)


@_staged(
    "dp13_leading_digit_audit",
    DP13_SQL,
    survey_ref="beyond reference (dp-family): Benford leading-digit profile "
    "of integer cents per event type — per-digit rows, no cross-digit float "
    "sum, fabrication screen",
)
def dp13_leading_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    d = (
        events.select(
            "event_type",
            F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .where(F.col("cents") > 0)  # zero magnitudes carry no leading digit
        .select(
            "event_type",
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("long")
            .alias("digit"),
        )
        # the digit frame feeds both the (type, digit) counts and the
        # per-type totals — one corpus scan, not two
        .localCheckpoint()
    )
    g = d.groupBy("event_type", "digit").agg(
        F.count(F.lit(1)).cast("long").alias("observed")
    )
    n = d.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    exp_p = F.log10((F.col("digit") + 1) * F.lit(1.0) / F.col("digit"))
    dev = F.col("observed") - F.col("n") * exp_p
    return g.join(F.broadcast(n), "event_type").select(
        "event_type",
        "digit",
        "observed",
        dround(F.col("observed") * F.lit(1.0) / F.col("n"), 6).alias(
            "observed_share"
        ),
        dround(exp_p, 6).alias("benford_expected"),
        dround(dev * dev / (F.col("n") * exp_p), 4).alias("chi2_contribution"),
    )
