"""STAGED round-14 operator candidates — NOT registered with the driver.

Third staging pool (see :mod:`queries.staged_r12` / :mod:`queries.staged_r13`
for the discipline): absent from :func:`queries.load_all`, invisible to
``REGISTRY``/``PREFIX_ORDER`` and the driver gate, fully verified NOW in
``tests/test_staged_r14.py`` (driver-strict oracle compare at 3 SFs,
pure-Python replays, family laws, plan-shape sweep) so a future round
registers each with a one-line move inside its ≤4-adds budget.

Ops (all "beyond reference" training-data-pipeline family, SURVEY §2.12):

* ``i13_incremental_minhash`` — sketch MAINTENANCE, the i-family pattern
  applied to MinHash: per-language corpus-level signatures (32 perms over
  token 3-gram shingles) computed on a base slice and a delta slice,
  merged by element-wise ``least`` — the semilattice merge that makes
  MinHash maintainable under appends without recompute.  The query emits
  the merged-equals-full proof column alongside pairwise cross-language
  Jaccard estimates and their EXACT Jaccard twins.  (Distinct from
  ``dd2_minhash_lsh``: dd2 signs documents for near-dup candidate
  generation; i13 maintains stratum-level sketches incrementally — the
  base+delta cost model of i12, applied to a sketch.)
* ``sp12_grouped_split_balance`` — leakage-safe GROUP-atomic train/val/
  test split: the unit of assignment is the user (all of a user's events
  follow one hash), and the report is what you read after group-splitting
  — per-split user/event mass, value means, click share, plus an HONEST
  straddle audit computed from the event-level data (not from the rule).
  (Distinct from ``sp1_train_test_split``'s row-level hash and
  ``sp10_decontaminated_split``'s benchmark removal: group atomicity is
  the anti-leakage property row-level splits structurally lack.)
* ``w14_spearman_trend`` — per-user monotone-trend detector: Spearman
  rank correlation between time order and value order with tie-broken
  (row_number) ranks, ALL-INTEGER until the final ratio — Σd² is an
  exact BIGINT, ρ = 1 − 6Σd²/(n(n²−1)) is one int→double chain, and the
  up/flat/down call is made on cross-multiplied INTEGERS (60Σd² vs 7D /
  13D), so no float boundary exists anywhere.  (Distinct from
  ``w11_cusum_drift``'s sequential level-shift alarm: Spearman is the
  O(n log n) global monotonicity measure, not a changepoint detector.)
* ``o10_file_skipping_stats`` — zone-map pruning effectiveness: files =
  50-doc groups, per-file min/max stats, and for a threshold-predicate
  grid the files-scanned / rows-scanned / rows-matched accounting, under
  BOTH the natural doc_id layout and an n_chars-clustered layout (the
  o8-style re-cluster).  This is the planner arithmetic a 100 TB
  lakehouse reader does with parquet row-group stats; the clustered
  layout's scan count collapses to ⌈matched/50⌉ — the quantified payoff
  of clustering.  (Distinct from ``o8_zorder_layout`` which BUILDS a
  layout manifest and ``o9_compaction_plan`` which sizes rewrites: o10
  MEASURES skip effectiveness of a layout against a workload.)

Float policy follows ``queries/__init__``: every float output is an
int/int ratio (or 1−ratio) under floor-form dround; w14's trend label and
sp12's splits are decided on exact integers; i13's signatures are exact
integer hash minima end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.windows import global_rank
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


# --- I13: incremental MinHash maintenance ------------------------------------
# Scale shape: shingling is a narrow flatMap; the DISTINCT (lang,
# shingle, slice) frame is one hash agg; the 32-perm explode runs on the
# DISTINCT frame (deduped first — never on raw occurrences); signatures
# are (|langs|·32)-row frames after the min agg, so every join past that
# point is on bounded sides.  The merge law (least of slice minima =
# min over the union) is what makes a 100 TB corpus's sketch refresh an
# O(delta) job instead of a recompute.
_I13_PERMS = 32

I13_SQL = r"""
WITH d AS (
    SELECT doc_id, lang, string_split(text, ' ') AS toks,
           (doc_id % 10 <> 0) AS is_base
    FROM documents
),
sh AS (
    SELECT DISTINCT lang, is_base,
           toks[i::INTEGER + 1] || ' ' || toks[i::INTEGER + 2] || ' ' ||
           toks[i::INTEGER + 3] AS shingle
    FROM d, unnest(range(len(toks) - 2)) t(i)
),
hashed AS (
    SELECT lang, is_base, p.p, {h32} AS h
    FROM sh, (SELECT unnest(range({perms})) AS p) p
),
fullsig AS (
    SELECT lang, p, min(h) AS mn FROM hashed GROUP BY lang, p
),
bsig AS (
    SELECT lang, p, min(h) AS mn FROM hashed WHERE is_base GROUP BY lang, p
),
dsig AS (
    SELECT lang, p, min(h) AS mn FROM hashed WHERE NOT is_base GROUP BY lang, p
),
msig AS (
    SELECT coalesce(b.lang, dl.lang) AS lang, coalesce(b.p, dl.p) AS p,
           least(coalesce(b.mn, dl.mn), coalesce(dl.mn, b.mn)) AS mn
    FROM bsig b FULL JOIN dsig dl ON b.lang = dl.lang AND b.p = dl.p
),
mok AS (
    SELECT f.lang, bool_and(f.mn = m.mn) AS merged_ok
    FROM fullsig f JOIN msig m ON f.lang = m.lang AND f.p = m.p
    GROUP BY f.lang
),
agree AS (
    SELECT a.lang AS lang_a, b.lang AS lang_b,
           sum(CASE WHEN a.mn = b.mn THEN 1 ELSE 0 END)::BIGINT AS n_agree
    FROM fullsig a JOIN fullsig b ON a.p = b.p AND a.lang < b.lang
    GROUP BY a.lang, b.lang
),
ls AS (SELECT DISTINCT lang, shingle FROM sh),
sizes AS (SELECT lang, count(*)::BIGINT AS n FROM ls GROUP BY lang),
inter AS (
    SELECT a.lang AS lang_a, b.lang AS lang_b, count(*)::BIGINT AS n_inter
    FROM ls a JOIN ls b ON a.shingle = b.shingle AND a.lang < b.lang
    GROUP BY a.lang, b.lang
)
SELECT g.lang_a, g.lang_b, {perms}::BIGINT AS n_perms, g.n_agree,
       {est6} AS jaccard_est,
       i.n_inter,
       (sa.n + sb.n - i.n_inter)::BIGINT AS n_union,
       {exact6} AS jaccard_exact,
       (ma.merged_ok AND mb.merged_ok) AS merged_equals_full
FROM agree g
JOIN inter i ON g.lang_a = i.lang_a AND g.lang_b = i.lang_b
JOIN sizes sa ON g.lang_a = sa.lang
JOIN sizes sb ON g.lang_b = sb.lang
JOIN mok ma ON g.lang_a = ma.lang
JOIN mok mb ON g.lang_b = mb.lang
""".format(
    h32=HASH32_SQL.format(x="p.p::VARCHAR || '|' || shingle"),
    perms=_I13_PERMS,
    est6=dround_sql(f"g.n_agree * 1.0 / {_I13_PERMS}", 6),
    exact6=dround_sql("i.n_inter * 1.0 / (sa.n + sb.n - i.n_inter)", 6),
)


@_staged(
    "i13_incremental_minhash",
    I13_SQL,
    survey_ref="beyond reference (i-family x dd-family): base+delta MinHash "
    "signature maintenance with the merged-equals-recompute proof and "
    "exact-Jaccard twins per language pair",
)
def i13_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    d = documents.select(
        "lang",
        F.split("text", " ").alias("toks"),
        (F.col("doc_id") % 10 != 0).alias("is_base"),
    ).where(F.size("toks") >= 3)
    sh = (
        d.select(
            "lang",
            "is_base",
            F.explode(F.sequence(F.lit(0), F.size("toks") - 3)).alias("i"),
            "toks",
        )
        .select(
            "lang",
            "is_base",
            F.concat_ws(
                " ",
                F.expr("element_at(toks, cast(i + 1 as int))"),
                F.expr("element_at(toks, cast(i + 2 as int))"),
                F.expr("element_at(toks, cast(i + 3 as int))"),
            ).alias("shingle"),
        )
        .distinct()
        # I3 stage materialization (the operators/dedup.py signature
        # pattern): the distinct shingle frame feeds FIVE consumers
        # (hashed, ls, sizes, inter×2) — without the checkpoint each one
        # re-scans and re-shingles the whole corpus (observed: 12 parquet
        # scans in the un-checkpointed plan; 1 after).
        .localCheckpoint()
    )
    hashed = sh.select(
        "lang",
        "is_base",
        F.explode(F.sequence(F.lit(0), F.lit(_I13_PERMS - 1))).alias("p"),
        "shingle",
    ).select(
        "lang",
        "is_base",
        "p",
        hash32(
            F.concat(F.col("p").cast("string"), F.lit("|"), F.col("shingle"))
        ).alias("h"),
    ).localCheckpoint()  # three signature aggs (full/base/delta) reuse the
    # 32x-exploded hash frame instead of re-hashing it three times
    fullsig = hashed.groupBy("lang", "p").agg(F.min("h").alias("mn"))
    bsig = (
        hashed.where("is_base").groupBy("lang", "p").agg(F.min("h").alias("mn"))
    )
    dsig = (
        hashed.where(~F.col("is_base"))
        .groupBy("lang", "p")
        .agg(F.min("h").alias("mn"))
    )
    msig = (
        bsig.withColumnsRenamed({"mn": "bmn"})
        .join(
            dsig.withColumnsRenamed({"mn": "dmn"}),
            ["lang", "p"],
            "full",
        )
        .select(
            "lang",
            "p",
            F.least(
                F.coalesce("bmn", "dmn"), F.coalesce("dmn", "bmn")
            ).alias("mn"),
        )
    )
    mok = (
        fullsig.withColumnsRenamed({"mn": "fmn"})
        .join(msig, ["lang", "p"])
        .groupBy("lang")
        .agg(F.bool_and(F.col("fmn") == F.col("mn")).alias("merged_ok"))
    )
    a = fullsig.select(
        F.col("lang").alias("lang_a"), "p", F.col("mn").alias("mna")
    )
    b = fullsig.select(
        F.col("lang").alias("lang_b"), "p", F.col("mn").alias("mnb")
    )
    agree = (
        a.join(b, "p")
        .where(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(
            F.sum(F.when(F.col("mna") == F.col("mnb"), 1).otherwise(0))
            .cast("long")
            .alias("n_agree")
        )
    )
    ls = sh.select("lang", "shingle").distinct()
    sizes = ls.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n"))
    inter = (
        ls.select(F.col("lang").alias("lang_a"), "shingle")
        .join(ls.select(F.col("lang").alias("lang_b"), "shingle"), "shingle")
        .where(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    return (
        agree.join(inter, ["lang_a", "lang_b"])
        .join(
            sizes.select(F.col("lang").alias("lang_a"), F.col("n").alias("na")),
            "lang_a",
        )
        .join(
            sizes.select(F.col("lang").alias("lang_b"), F.col("n").alias("nb")),
            "lang_b",
        )
        .join(
            mok.select(F.col("lang").alias("lang_a"), F.col("merged_ok").alias("oka")),
            "lang_a",
        )
        .join(
            mok.select(F.col("lang").alias("lang_b"), F.col("merged_ok").alias("okb")),
            "lang_b",
        )
        .select(
            "lang_a",
            "lang_b",
            F.lit(_I13_PERMS).cast("long").alias("n_perms"),
            "n_agree",
            dround(F.col("n_agree") * F.lit(1.0) / F.lit(_I13_PERMS), 6).alias(
                "jaccard_est"
            ),
            "n_inter",
            (F.col("na") + F.col("nb") - F.col("n_inter"))
            .cast("long")
            .alias("n_union"),
            dround(
                F.col("n_inter")
                * F.lit(1.0)
                / (F.col("na") + F.col("nb") - F.col("n_inter")),
                6,
            ).alias("jaccard_exact"),
            (F.col("oka") & F.col("okb")).alias("merged_equals_full"),
        )
    )


# --- SP12: group-atomic split + balance/leakage report ------------------------
# Scale shape: the split is a pure hash expression on the fact row (zero
# state); the audit is two hash aggs (per-user distinct-split collapse,
# then per-split rollup).  The straddle count is computed FROM THE DATA
# (distinct split labels observed per user), so a regression to row-level
# hashing shows up as a nonzero column, not a silent leak.  Value mass
# uses the finite-decimal cents rule (2-decimal values sum as exact
# BIGINT cents).
SP12_SQL = r"""
WITH assigned AS (
    SELECT user_id, event_type,
           floor(value * 100.0 + 0.5)::BIGINT AS cents,
           CASE WHEN {h} % 100 < 80 THEN 'train'
                WHEN {h} % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM events
),
u AS (
    SELECT user_id, count(DISTINCT split) AS nsplit FROM assigned GROUP BY user_id
),
m AS (
    SELECT DISTINCT a.user_id, a.split, u.nsplit
    FROM assigned a JOIN u ON a.user_id = u.user_id
),
tot AS (SELECT count(*)::BIGINT AS n FROM events)
SELECT a.split,
       count(DISTINCT a.user_id)::BIGINT AS n_users,
       count(*)::BIGINT AS n_events,
       {share6} AS event_share,
       {mean4} AS mean_value,
       {click6} AS click_share,
       (SELECT sum(CASE WHEN m.nsplit > 1 THEN 1 ELSE 0 END)::BIGINT
        FROM m WHERE m.split = a.split) AS n_straddling_users
FROM assigned a CROSS JOIN tot
GROUP BY a.split, tot.n
""".format(
    h=HASH32_SQL.format(x="'u' || user_id::VARCHAR"),
    share6=dround_sql("count(*)::BIGINT * 1.0 / tot.n", 6),
    mean4=dround_sql("sum(cents)::BIGINT * 1.0 / count(*) / 100.0", 4),
    click6=dround_sql(
        "sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT"
        " * 1.0 / count(*)",
        6,
    ),
)


@_staged(
    "sp12_grouped_split_balance",
    SP12_SQL,
    survey_ref="beyond reference (sp-family): leakage-safe group-atomic "
    "train/val/test split with a data-derived straddle audit and per-split "
    "balance report",
)
def sp12_grouped_split_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    h = hash32(F.concat(F.lit("u"), F.col("user_id").cast("string"))) % 100
    assigned = events.select(
        "user_id",
        "event_type",
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test").alias("split"),
    )
    u = assigned.groupBy("user_id").agg(
        F.count_distinct("split").alias("nsplit")
    )
    m = assigned.select("user_id", "split").distinct().join(u, "user_id")
    straddle = m.groupBy("split").agg(
        F.sum(F.when(F.col("nsplit") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_straddling_users")
    )
    tot = events.agg(F.count(F.lit(1)).cast("long").alias("n"))
    click1 = F.when(F.col("event_type") == "click", 1).otherwise(0)
    per = (
        assigned.crossJoin(F.broadcast(tot))  # 1-row broadcast total: the
        # allowlisted bounded-frame BNLJ shape
        .groupBy("split")
        .agg(
            F.count_distinct("user_id").cast("long").alias("n_users"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            dround(F.count(F.lit(1)).cast("long") * F.lit(1.0) / F.max("n"), 6).alias(
                "event_share"
            ),
            dround(
                F.sum("cents").cast("long")
                * F.lit(1.0)
                / F.count(F.lit(1))
                / F.lit(100.0),
                4,
            ).alias("mean_value"),
            dround(F.sum(click1).cast("long") * F.lit(1.0) / F.count(F.lit(1)), 6).alias(
                "click_share"
            ),
        )
    )
    return per.join(F.broadcast(straddle), "split").select(
        "split",
        "n_users",
        "n_events",
        "event_share",
        "mean_value",
        "click_share",
        "n_straddling_users",
    )


# --- W14: per-user Spearman trend ---------------------------------------------
# Scale shape: two rank windows and one agg, all partitioned by user_id
# (bounded frames); no joins at all.  All arithmetic is exact-integer
# until the single ρ ratio; the trend label is decided by integer
# cross-multiplication (ρ > 0.3 ⟺ 60Σd² < 7·n(n²−1)) so the label can
# never straddle a float boundary.
W14_SQL = r"""
WITH r AS (
    SELECT user_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rt,
           row_number() OVER (PARTITION BY user_id ORDER BY value, event_id) AS rv
    FROM events
),
g AS (
    SELECT user_id, count(*)::BIGINT AS n,
           sum((rt - rv) * (rt - rv))::BIGINT AS sum_d2
    FROM r GROUP BY user_id HAVING count(*) >= 2
)
SELECT user_id, n AS n_events, sum_d2,
       {rho6} AS spearman_rho,
       CASE WHEN 60 * sum_d2 < 7 * (n * (n * n - 1)) THEN 'up'
            WHEN 60 * sum_d2 > 13 * (n * (n * n - 1)) THEN 'down'
            ELSE 'flat' END AS trend
FROM g
""".format(
    rho6=dround_sql("1.0 - (6 * sum_d2) * 1.0 / (n * (n * n - 1))", 6)
)


@_staged(
    "w14_spearman_trend",
    W14_SQL,
    survey_ref="beyond reference (w-family): per-user Spearman rank trend — "
    "exact integer sum-d2, integer cross-multiplied trend labels",
)
def w14_spearman_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    wt = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wv = Window.partitionBy("user_id").orderBy("value", "event_id")
    r = events.select(
        "user_id",
        F.row_number().over(wt).alias("rt"),
        F.row_number().over(wv).alias("rv"),
    )
    d = (F.col("rt") - F.col("rv")).cast("long")
    g = (
        r.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(d * d).cast("long").alias("sum_d2"),
        )
        .where(F.col("n") >= 2)
    )
    dd = F.col("sum_d2")
    den = F.col("n") * (F.col("n") * F.col("n") - 1)
    return g.select(
        "user_id",
        F.col("n").alias("n_events"),
        "sum_d2",
        dround(F.lit(1.0) - (F.lit(6) * dd) * F.lit(1.0) / den, 6).alias(
            "spearman_rho"
        ),
        F.when(F.lit(60) * dd < F.lit(7) * den, "up")
        .when(F.lit(60) * dd > F.lit(13) * den, "down")
        .otherwise("flat")
        .alias("trend"),
    )


# --- O10: zone-map file-skipping effectiveness --------------------------------
# Scale shape: per-file stats are one hash agg over (layout, file_id);
# the clustered layout's rank comes from the factored global_rank
# combinator (range exchange + __pid window — never a single-partition
# window over the fact); the threshold grid is a 4-element explode over
# the |files|-row stats frame; exact matched counts are one conditional
# agg pass.  The law the replay asserts is the point of clustering:
# under the n_chars-sorted layout the matching rows are a contiguous
# suffix, so files-scanned collapses to the information-theoretic
# minimum while the natural layout scans nearly everything.
_O10_FILE_DOCS = 50
_O10_THRESHOLDS = (100, 200, 300, 400)

O10_SQL = r"""
WITH nat AS (
    SELECT 'natural' AS layout, (doc_id // {L})::BIGINT AS file_id, n_chars
    FROM documents
),
rk AS (
    SELECT n_chars,
           row_number() OVER (ORDER BY n_chars, doc_id) AS rnk
    FROM documents
),
clu AS (
    SELECT 'clustered' AS layout, ((rnk - 1) // {L})::BIGINT AS file_id, n_chars
    FROM rk
),
files AS (
    SELECT layout, file_id, max(n_chars) AS max_nc, count(*)::BIGINT AS n_rows
    FROM (SELECT * FROM nat UNION ALL SELECT * FROM clu)
    GROUP BY layout, file_id
),
ft AS (
    SELECT f.*, t.threshold
    FROM files f, (SELECT unnest([{ts}]) AS threshold) t
),
per AS (
    SELECT layout, threshold::BIGINT AS threshold,
           count(*)::BIGINT AS n_files,
           sum(CASE WHEN max_nc >= threshold THEN 1 ELSE 0 END)::BIGINT
               AS n_files_scanned,
           sum(CASE WHEN max_nc >= threshold THEN n_rows ELSE 0 END)::BIGINT
               AS n_rows_scanned
    FROM ft GROUP BY layout, threshold
),
mt AS (
    SELECT t.threshold::BIGINT AS threshold,
           sum(CASE WHEN d.n_chars >= t.threshold THEN 1 ELSE 0 END)::BIGINT
               AS n_rows_matched
    FROM documents d, (SELECT unnest([{ts}]) AS threshold) t
    GROUP BY t.threshold
)
SELECT p.layout, p.threshold, p.n_files, p.n_files_scanned, p.n_rows_scanned,
       m.n_rows_matched,
       {skip6} AS skip_ratio,
       {eff6} AS scan_efficiency
FROM per p JOIN mt m ON p.threshold = m.threshold
""".format(
    L=_O10_FILE_DOCS,
    ts=", ".join(str(t) for t in _O10_THRESHOLDS),
    skip6=dround_sql(
        "1.0 - p.n_files_scanned * 1.0 / p.n_files",
        6,
    ),
    eff6=dround_sql(
        "CASE WHEN p.n_rows_scanned = 0 THEN 0.0"
        " ELSE m.n_rows_matched * 1.0 / p.n_rows_scanned END",
        6,
    ),
)


@_staged(
    "o10_file_skipping_stats",
    O10_SQL,
    survey_ref="beyond reference (o-family): min/max zone-map pruning "
    "effectiveness under natural vs clustered layouts — the parquet "
    "row-group skip arithmetic, quantified per predicate",
)
def o10_file_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    docs = documents.select("doc_id", "n_chars")
    nat = docs.select(
        F.lit("natural").alias("layout"),
        F.expr(f"doc_id div {_O10_FILE_DOCS}").cast("long").alias("file_id"),
        "n_chars",
    )
    ranked = global_rank(docs, "n_chars", "doc_id", rank_col="rnk")
    clu = ranked.select(
        F.lit("clustered").alias("layout"),
        F.expr(f"(rnk - 1) div {_O10_FILE_DOCS}").cast("long").alias("file_id"),
        "n_chars",
    )
    files = (
        nat.unionByName(clu)
        .groupBy("layout", "file_id")
        .agg(
            F.max("n_chars").alias("max_nc"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )
    tcol = F.explode(
        F.array(*[F.lit(t) for t in _O10_THRESHOLDS])
    ).alias("threshold")
    scanned = F.when(F.col("max_nc") >= F.col("threshold"), 1).otherwise(0)
    scanned_rows = F.when(
        F.col("max_nc") >= F.col("threshold"), F.col("n_rows")
    ).otherwise(F.lit(0))
    per = (
        files.select("*", tcol)
        .groupBy("layout", F.col("threshold").cast("long").alias("threshold"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(scanned).cast("long").alias("n_files_scanned"),
            F.sum(scanned_rows).cast("long").alias("n_rows_scanned"),
        )
    )
    mt = (
        docs.select("n_chars", tcol)
        .groupBy(F.col("threshold").cast("long").alias("threshold"))
        .agg(
            F.sum(F.when(F.col("n_chars") >= F.col("threshold"), 1).otherwise(0))
            .cast("long")
            .alias("n_rows_matched")
        )
    )
    return per.join(F.broadcast(mt), "threshold").select(
        "layout",
        "threshold",
        "n_files",
        "n_files_scanned",
        "n_rows_scanned",
        "n_rows_matched",
        dround(
            F.lit(1.0) - F.col("n_files_scanned") * F.lit(1.0) / F.col("n_files"), 6
        ).alias("skip_ratio"),
        dround(
            F.when(F.col("n_rows_scanned") == 0, F.lit(0.0)).otherwise(
                F.col("n_rows_matched") * F.lit(1.0) / F.col("n_rows_scanned")
            ),
            6,
        ).alias("scan_efficiency"),
    )
