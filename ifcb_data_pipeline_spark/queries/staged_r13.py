"""STAGED round-13 operator candidates — NOT registered with the driver.

Same staging discipline as :mod:`queries.staged_r12` (which holds the
round-12 candidates): this module is absent from :func:`queries.load_all`'s
import list, so nothing here enters ``REGISTRY``/``PREFIX_ORDER`` or the
driver's correctness gate, and the ≤4-registered-adds-per-round throttle
(VERDICT r8/r9) is untouched.  All four are built and fully verified NOW
(driver-strict oracle compare + pure-Python recompute + family laws in
``tests/test_staged_r13.py``) so a future round registers each with a
one-line move.

Ops (all "beyond reference" training-data-pipeline family, SURVEY §2.12):

* ``tx16_bigram_vocab_coverage`` — train/serve vocabulary mismatch audit:
  a token-bigram vocabulary built ONLY on the ``en`` sub-corpus
  (min-count cut), then per-language occurrence coverage and OOV type
  counts — the "how well does the tokenizer's training slice transfer"
  number a multilingual pipeline reads before fixing a vocab.
  (Distinct from ``tx5_vocabulary``, which builds one global top-50
  doc-frequency table — tx16 measures the TRANSFER of a slice-trained
  vocab across languages, the failure tx5's global build can't see.)
* ``pk4_cdc_chunking`` — content-defined chunking (rsync / LBFS style):
  boundaries where the rolling 8-gram hash ≡ 0 (mod 32), chunks
  content-addressed by full md5, cross-corpus shared-chunk accounting —
  the storage-level dedup companion to dd20's match-level dedup.
  (Distinct from ``pk2_document_chunking``'s fixed window/stride cuts:
  CDC boundaries are content-local, so an edit reshuffles one chunk —
  the property fixed-stride chunking structurally lacks.)
* ``w13_mad_anomaly`` — robust per-user outlier gate: median and MAD as
  EXACT rank-⌈n/2⌉ order statistics (never interpolated — interpolation
  is engine-specific float arithmetic; an order statistic is a data
  value, bit-identical everywhere), anomaly = |x − med| > 3·MAD.
  (Distinct from ``w12_mad_outliers``: w12 flags individual events
  against per-EVENT-TYPE interpolated cents-medians via the
  Iglewicz–Hoaglin z; w13 is the per-ENTITY gate — |users| summary rows,
  uninterpolated order statistics, the per-user data-quality scorecard.)
* ``sim13_int8_quant_error`` — symmetric PER-DIMENSION int8 scalar
  quantization of the embedding corpus (the calibrated variant real ANN
  indexes ship: one corpus-wide scale per dimension) with reconstruction
  MSE / cosine fidelity / saturation accounting, computed entirely with
  higher-order array functions (zip_with + aggregate) — the fat side
  never explodes and never joins anything bigger than a 1-row broadcast
  scale vector.  (Distinct from ``sim6_embedding_quantize``'s per-VECTOR
  scale, which needs no corpus pass and can't saturate — sim13 is the
  shared-codebook calibration step, with the cross-vector comparability
  and saturation trade-off that implies.)

Float policy follows ``queries/__init__`` exactly:

* tx16/pk4 emit int/int ratios under floor-form :func:`dround` — safe.
* w13's med/mad are raw order statistics (data values) and ``dev`` is a
  single subtract+abs on identical doubles — bit-identical cross-engine
  with NO rounding needed; only the int/int anomaly fraction is dround'd.
* sim13 uses the quantized-sum rule: every per-dimension float term is
  floored onto a 1e-12 integer grid BEFORE summation, so group sums are
  exact BIGINTs and order-insensitive; the headline MSE/cosine are then
  short deterministic chains (int→double division, one sqrt) on exact
  inputs, dround'd well inside the bit-identical regime.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._util import dround, dround_sql, tables


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


# --- TX16: en-trained bigram vocabulary, per-language coverage ---------------
# The real pipeline failure this measures: a tokenizer/vocab trained on
# the dominant language slice silently fragments the rest of the corpus.
# Vocabulary = token bigrams of the `en` documents with count >= 3 (the
# word2vec-style min-count df-cut); the report is per-language token-
# occurrence coverage and distinct-OOV-type counts.  Scale shape: the
# tokenize+bigram step is a narrow flatMap (explode over an index
# sequence — no join, no shuffle); the vocabulary is a hash agg already
# reduced by the min-count cut, broadcast to the occurrence stream
# (AQE falls back to a shuffled hash join if a 100 TB corpus's vocab
# outgrows the broadcast threshold — both plans are correct, the cut
# keeps the build side minimal either way); the final agg is |langs|
# rows.  Coverage is int/int under dround — exact cross-engine.
TX16_SQL = r"""
WITH d AS (
    SELECT lang, string_split(text, ' ') AS toks FROM documents
),
b AS (
    SELECT lang, toks[i::INTEGER + 1] || ' ' || toks[i::INTEGER + 2] AS bg
    FROM d, unnest(range(len(toks) - 1)) t(i)
),
v AS (
    SELECT bg FROM b WHERE lang = 'en' GROUP BY bg HAVING count(*) >= 3
),
f AS (
    SELECT b.lang, b.bg, (v.bg IS NOT NULL) AS inv
    FROM b LEFT JOIN v ON b.bg = v.bg
)
SELECT lang,
       count(*)::BIGINT AS n_bigrams,
       sum(CASE WHEN inv THEN 1 ELSE 0 END)::BIGINT AS n_in_vocab,
       count(DISTINCT CASE WHEN NOT inv THEN bg END)::BIGINT AS oov_types,
       {cov6} AS coverage
FROM f
GROUP BY lang
""".format(
    cov6=dround_sql("sum(CASE WHEN inv THEN 1 ELSE 0 END)::BIGINT * 1.0 / count(*)", 6)
)


@_staged(
    "tx16_bigram_vocab_coverage",
    TX16_SQL,
    survey_ref="beyond reference: en-trained token-bigram vocabulary "
    "(min-count 3) with per-language occurrence coverage and OOV types",
)
def tx16_bigram_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    d = documents.select("lang", F.split("text", " ").alias("toks")).where(
        F.size("toks") >= 2  # oracle's range(len-1) emits nothing for <2 tokens
    )
    b = d.select(
        "lang",
        F.explode(F.sequence(F.lit(0), F.size("toks") - 2)).alias("i"),
        "toks",
    ).select(
        "lang",
        F.concat(
            F.expr("element_at(toks, cast(i + 1 as int))"),
            F.lit(" "),
            F.expr("element_at(toks, cast(i + 2 as int))"),
        ).alias("bg"),
    )
    v = (
        b.where(F.col("lang") == "en")
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 3)
        .select("bg", F.lit(True).alias("inv"))
    )
    f = b.join(F.broadcast(v), "bg", "left").select(
        "lang", "bg", F.coalesce("inv", F.lit(False)).alias("inv")
    )
    inv1 = F.when(F.col("inv"), 1).otherwise(0)
    return f.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum(inv1).cast("long").alias("n_in_vocab"),
        F.count_distinct(F.when(~F.col("inv"), F.col("bg")))
        .cast("long")
        .alias("oov_types"),
        dround(F.sum(inv1).cast("long") * F.lit(1.0) / F.count(F.lit(1)), 6).alias(
            "coverage"
        ),
    )


# --- PK4: content-defined chunking + shared-chunk accounting -----------------
# LBFS/rsync-style CDC: a chunk boundary sits before position p whenever
# the 8-char gram starting at p hashes to 0 (mod 32) — expected ~32-char
# chunks, boundaries decided by LOCAL content only, so an insertion
# reshuffles one chunk, not the whole file (the property that makes CDC
# the storage-dedup standard).  Chunks are content-addressed by full md5
# (128-bit — no collision caveat); a chunk is "shared" if its content
# occurs ≥2 times corpus-wide (across or within docs).  Scale shape:
# boundary detection AND interval construction happen inside higher-order
# array functions on the document row — a single narrow scan, NO window,
# NO self-join, no re-scan of documents; the only wide ops are the
# chunk-hash dup agg and the hash join back, both keyed on the md5
# (uniform — salt-free).  Per-doc arrays are bounded by doc length, the
# same bound dd20's per-doc window carries.  mean/dup_frac are int/int
# under dround.
PK4_SQL = r"""
WITH starts AS (
    SELECT doc_id, 0::BIGINT AS start FROM documents
    UNION ALL
    SELECT doc_id, p::BIGINT AS start
    FROM documents, unnest(range(1, greatest(length(text) - 7, 1))) t(p)
    WHERE (('0x' || substr(md5(substr(text, p::INTEGER + 1, 8)), 1, 8))::BIGINT)
          % 32 = 0
),
iv AS (
    SELECT s.doc_id, s.start,
           coalesce(lead(s.start) OVER (PARTITION BY s.doc_id ORDER BY s.start),
                    length(d.text)::BIGINT) AS fin,
           d.text, length(d.text)::BIGINT AS n_chars
    FROM starts s JOIN documents d USING (doc_id)
),
ch AS (
    SELECT doc_id, n_chars, fin - start AS clen,
           md5(substr(text, start::INTEGER + 1, (fin - start)::INTEGER)) AS chash
    FROM iv
),
dup AS (
    SELECT chash FROM ch GROUP BY chash HAVING count(*) >= 2
)
SELECT ch.doc_id,
       count(*)::BIGINT AS n_chunks,
       max(ch.clen)::BIGINT AS max_chunk_len,
       {mean4} AS mean_chunk_len,
       sum(CASE WHEN dup.chash IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           AS n_shared_chunks,
       sum(CASE WHEN dup.chash IS NOT NULL THEN ch.clen ELSE 0 END)::BIGINT
           AS shared_chars,
       {dupfrac6} AS dup_frac
FROM ch LEFT JOIN dup ON ch.chash = dup.chash
GROUP BY ch.doc_id
""".format(
    mean4=dround_sql("sum(ch.clen)::BIGINT * 1.0 / count(*)", 4),
    dupfrac6=dround_sql(
        "sum(CASE WHEN dup.chash IS NOT NULL THEN ch.clen ELSE 0 END)::BIGINT"
        " * 1.0 / max(ch.n_chars)",
        6,
    ),
)

# boundary rule + interval construction as pure array expressions: one
# narrow projection, no window, no second documents scan.  `get()` is the
# 0-based null-safe indexer (ANSI-proof); the CASE guards Spark's
# descending-sequence surprise for sub-9-char docs.
_PK4_STARTS = """
CASE WHEN length(text) >= 9 THEN
    concat(
        array(0L),
        filter(
            sequence(1L, cast(length(text) - 8 as bigint)),
            p -> cast(conv(substring(md5(substring(text, cast(p + 1 as int), 8)),
                                     1, 8), 16, 10) as bigint) % 32 = 0
        )
    )
ELSE array(0L) END
"""

_PK4_CHUNKS = """
transform(
    starts,
    (s, i) -> named_struct(
        'clen',
        coalesce(get(starts, i + 1), cast(length(text) as bigint)) - s,
        'chash',
        md5(substring(
            text,
            cast(s + 1 as int),
            cast(coalesce(get(starts, i + 1), cast(length(text) as bigint)) - s
                 as int)))
    )
)
"""


@_staged(
    "pk4_cdc_chunking",
    PK4_SQL,
    survey_ref="beyond reference: content-defined chunking (rolling-hash "
    "boundaries, md5-content-addressed) with corpus shared-chunk accounting",
)
def pk4_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    ch = (
        documents.select(
            "doc_id",
            F.length("text").cast("long").alias("n_chars"),
            F.expr(_PK4_STARTS).alias("starts"),
            "text",
        )
        .select("doc_id", "n_chars", F.explode(F.expr(_PK4_CHUNKS)).alias("c"))
        .select("doc_id", "n_chars", F.col("c.clen").alias("clen"), F.col("c.chash").alias("chash"))
    )
    dup = (
        ch.groupBy("chash")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 2)
        .select("chash", F.lit(True).alias("shared"))
    )
    j = ch.join(dup, "chash", "left").select(
        "doc_id", "n_chars", "clen", F.coalesce("shared", F.lit(False)).alias("shared")
    )
    sh1 = F.when(F.col("shared"), 1).otherwise(0)
    shlen = F.when(F.col("shared"), F.col("clen")).otherwise(F.lit(0))
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.max("clen").cast("long").alias("max_chunk_len"),
        dround(F.sum("clen").cast("long") * F.lit(1.0) / F.count(F.lit(1)), 4).alias(
            "mean_chunk_len"
        ),
        F.sum(sh1).cast("long").alias("n_shared_chunks"),
        F.sum(shlen).cast("long").alias("shared_chars"),
        dround(F.sum(shlen).cast("long") * F.lit(1.0) / F.max("n_chars"), 6).alias(
            "dup_frac"
        ),
    )


# --- W13: robust per-user anomaly gate (median/MAD order statistics) ---------
# Data-quality outlier gating wants robust statistics; the cross-engine
# trap is that "median" interpolates on even counts and each engine
# interpolates in its own float order.  This op defines med and MAD as
# the rank-⌈n/2⌉ ORDER STATISTIC under the total order (value, event_id)
# — a value physically present in the data, bit-identical everywhere.
# dev = |x − med| is one subtract + abs on identical doubles; the 3·MAD
# threshold is one multiply — the comparison is deterministic (ties at
# exactly 3·MAD would need |x−med| = 3·|y−med| in exact IEEE, measure
# zero; MAD = 0 degenerates to dev > 0, still exact).  Scale shape: two
# rank windows and one agg, ALL partitioned by user_id (bounded frames —
# events-per-user, never a global sort); the med/mad side tables are
# 1-row-per-user (broadcast-or-shuffle, AQE's call).
W13_SQL = r"""
WITH r AS (
    SELECT user_id, event_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY value, event_id) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM events
),
med AS (
    SELECT user_id, value AS med, n FROM r WHERE rn = (n + 1) // 2
),
a AS (
    SELECT r.user_id, r.event_id, abs(r.value - med.med) AS dev, med.med, med.n
    FROM r JOIN med USING (user_id)
),
r2 AS (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY dev, event_id) AS rn2
    FROM a
),
mad AS (
    SELECT user_id, dev AS mad FROM r2 WHERE rn2 = (n + 1) // 2
)
SELECT a.user_id,
       count(*)::BIGINT AS n_events,
       max(a.med) AS med_value,
       max(mad.mad) AS mad_value,
       sum(CASE WHEN a.dev > 3.0 * mad.mad THEN 1 ELSE 0 END)::BIGINT
           AS n_anomalies,
       {frac6} AS anomaly_frac
FROM a JOIN mad USING (user_id)
GROUP BY a.user_id
""".format(
    frac6=dround_sql(
        "sum(CASE WHEN a.dev > 3.0 * mad.mad THEN 1 ELSE 0 END)::BIGINT"
        " * 1.0 / count(*)",
        6,
    )
)


@_staged(
    "w13_mad_anomaly",
    W13_SQL,
    survey_ref="beyond reference: robust per-user outlier gate — median/MAD "
    "as exact rank-ceil(n/2) order statistics, anomaly = dev > 3*MAD",
)
def w13_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    ev = events.select("user_id", "event_id", "value")
    wv = Window.partitionBy("user_id").orderBy("value", "event_id")
    wall = Window.partitionBy("user_id")
    r = ev.withColumn("rn", F.row_number().over(wv)).withColumn(
        "n", F.count(F.lit(1)).over(wall)
    )
    med = r.where(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "user_id", F.col("value").alias("med"), "n"
    )
    a = (
        r.select("user_id", "event_id", "value")
        .join(med, "user_id")
        .select(
            "user_id",
            "event_id",
            F.abs(F.col("value") - F.col("med")).alias("dev"),
            "med",
            "n",
        )
    )
    wd = Window.partitionBy("user_id").orderBy("dev", "event_id")
    mad = (
        a.withColumn("rn2", F.row_number().over(wd))
        .where(F.col("rn2") == F.expr("(n + 1) div 2"))
        .select("user_id", F.col("dev").alias("mad"))
    )
    anom = F.when(F.col("dev") > F.lit(3.0) * F.col("mad"), 1).otherwise(0)
    return (
        a.join(mad, "user_id")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max("med").alias("med_value"),
            F.max("mad").alias("mad_value"),
            F.sum(anom).cast("long").alias("n_anomalies"),
            dround(F.sum(anom).cast("long") * F.lit(1.0) / F.count(F.lit(1)), 6).alias(
                "anomaly_frac"
            ),
        )
    )


# --- SIM13: symmetric per-dim int8 quantization fidelity ---------------------
# The standard ANN index compression: per-dimension symmetric int8 with
# scale s_d = max|x_d| over the corpus, q = round_half_up(x·127/s) in
# [-127, 127], reconstruction r = q·s/127.  Reports per-vector
# reconstruction MSE, cosine(x, r), and saturation count — the fidelity
# sheet an ANN deployment reads before switching the index to int8.
# Determinism: every per-dim float term (squared error, x·r, x·x, r·r)
# is floored onto the 1e-12 integer grid INSIDE the array fold, so the
# per-vector sums are exact BIGINTs (quantized-sum rule); MSE and cosine
# are then short identical chains on exact ints (two divisions; one
# sqrt of a product of exact-int doubles), dround'd far from any
# boundary.  Scale shape: the per-dim scale vector is a 64-row agg from
# one narrow posexplode pass, collapsed to ONE row and broadcast (the
# allowlisted 1-row-broadcast BNLJ frame); the corpus side then runs
# zip_with/aggregate entirely inside the row — no explode of the fat
# side, no shuffle besides the final nothing (output is per-vector).
SIM13_SQL = r"""
WITH e AS (
    SELECT vec_id, label::BIGINT AS label, i::INTEGER AS dim,
           embedding[i::INTEGER + 1]::DOUBLE AS x,
           len(embedding)::BIGINT AS d
    FROM embeddings, unnest(range(len(embedding))) t(i)
),
s AS (
    SELECT dim, max(abs(x)) AS s FROM e GROUP BY dim
),
q AS (
    SELECT e.vec_id, e.label, e.d, e.x, s.s,
           CASE WHEN s.s > 0
                THEN least(127::BIGINT, greatest((-127)::BIGINT,
                           floor(e.x * 127.0 / s.s + 0.5)::BIGINT))
                ELSE 0::BIGINT END AS qv
    FROM e JOIN s USING (dim)
),
r AS (
    SELECT vec_id, label, d, x, qv, qv * s / 127.0 AS rx FROM q
),
p AS (
    SELECT vec_id, label, d,
           floor((x - rx) * (x - rx) * 1000000000000.0 + 0.5)::BIGINT AS e2p,
           floor(x * rx * 1000000000000.0 + 0.5)::BIGINT AS xrp,
           floor(x * x * 1000000000000.0 + 0.5)::BIGINT AS xxp,
           floor(rx * rx * 1000000000000.0 + 0.5)::BIGINT AS rrp,
           CASE WHEN abs(qv) = 127 THEN 1 ELSE 0 END AS sat
    FROM r
),
g AS (
    SELECT vec_id, label, max(d) AS n_dims,
           sum(e2p)::BIGINT AS se2, sum(xrp)::BIGINT AS sxr,
           sum(xxp)::BIGINT AS sxx, sum(rrp)::BIGINT AS srr,
           sum(sat)::BIGINT AS n_saturated
    FROM p GROUP BY vec_id, label
)
SELECT vec_id, label, n_dims::BIGINT AS n_dims, n_saturated,
       {mse} AS mse_q,
       {cos} AS cos_sim_q
FROM g
""".format(
    mse=dround_sql("se2 * 1.0 / 1000000000000.0 / n_dims", 12),
    cos=dround_sql("sxr / sqrt(sxx::DOUBLE * srr::DOUBLE)", 6),
)

_SIM13_QARR = """
zip_with(embedding, scales, (x, s) ->
    CASE WHEN s > 0D
         THEN least(127L, greatest(-127L,
              cast(floor(cast(x as double) * 127.0D / s + 0.5D) as bigint)))
         ELSE 0L END)
"""

# each lambda floors its term onto the 1e-12 grid, then folds with an
# exact BIGINT accumulator — the quantized-sum rule inside one array op
_SIM13_FOLDS = {
    "se2": (
        "aggregate(zip_with(embedding, rxarr, (x, r) -> "
        "cast(floor((cast(x as double) - r) * (cast(x as double) - r)"
        " * 1000000000000.0D + 0.5D) as bigint)), 0L, (a, v) -> a + v)"
    ),
    "sxr": (
        "aggregate(zip_with(embedding, rxarr, (x, r) -> "
        "cast(floor(cast(x as double) * r * 1000000000000.0D + 0.5D) as bigint)),"
        " 0L, (a, v) -> a + v)"
    ),
    "sxx": (
        "aggregate(transform(embedding, x -> "
        "cast(floor(cast(x as double) * cast(x as double) * 1000000000000.0D"
        " + 0.5D) as bigint)), 0L, (a, v) -> a + v)"
    ),
    "srr": (
        "aggregate(transform(rxarr, r -> "
        "cast(floor(r * r * 1000000000000.0D + 0.5D) as bigint)),"
        " 0L, (a, v) -> a + v)"
    ),
}


@_staged(
    "sim13_int8_quant_error",
    SIM13_SQL,
    survey_ref="beyond reference: per-dim symmetric int8 embedding "
    "quantization — reconstruction MSE, cosine fidelity, saturation; "
    "zip_with/aggregate, corpus never exploded or joined fat",
)
def sim13_int8_quant_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    # pass 1 (narrow + 64-row agg): per-dimension max|x| scale vector
    dims = embeddings.select(
        F.posexplode("embedding").alias("dim", "xf")
    ).select("dim", F.abs(F.col("xf").cast("double")).alias("ax"))
    s_rows = dims.groupBy("dim").agg(F.max("ax").alias("s"))
    scale_row = s_rows.agg(
        F.array_sort(F.collect_list(F.struct("dim", "s"))).alias("ss")
    ).select(F.expr("transform(ss, x -> x.s)").alias("scales"))
    # pass 2: all per-vector math inside array higher-order functions
    j = embeddings.crossJoin(F.broadcast(scale_row))  # 1-row broadcast side:
    # the allowlisted bounded-frame BNLJ shape, not a data-sized cartesian
    q = j.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.size("embedding").cast("long").alias("n_dims"),
        "embedding",
        F.expr(_SIM13_QARR).alias("qarr"),
        "scales",
    ).select(
        "vec_id",
        "label",
        "n_dims",
        "embedding",
        "qarr",
        F.expr(
            "zip_with(qarr, scales, (q, s) -> cast(q as double) * s / 127.0D)"
        ).alias("rxarr"),
    )
    g = q.select(
        "vec_id",
        "label",
        "n_dims",
        F.expr("cast(size(filter(qarr, q -> abs(q) = 127L)) as bigint)").alias(
            "n_saturated"
        ),
        *[F.expr(sql).alias(k) for k, sql in _SIM13_FOLDS.items()],
    )
    return g.select(
        "vec_id",
        "label",
        "n_dims",
        "n_saturated",
        dround(
            F.col("se2") * F.lit(1.0) / F.lit(1000000000000.0) / F.col("n_dims"), 12
        ).alias("mse_q"),
        dround(
            F.col("sxr")
            / F.sqrt(F.col("sxx").cast("double") * F.col("srr").cast("double")),
            6,
        ).alias("cos_sim_q"),
    )
