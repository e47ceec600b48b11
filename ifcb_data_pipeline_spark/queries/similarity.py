"""Similarity-search query family (BASELINE.json north-star operators).

Anchors for the LSH variant are the embeddings of vec_id 0..7, derived
from the table itself in both engines (no out-of-band literals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.similarity import cosine, cosine_topk, dot, label_centroids
from . import register
from ._util import dround, tables

_COS_SQL = (
    "(list_inner_product({a}, {b})"
    " / sqrt(list_inner_product({a}, {a}) * list_inner_product({b}, {b})))"
)

# --- SIM1: brute-force cosine top-k ---------------------------------------
SIM1_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS MATERIALIZED (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_COS_SQL.format(a="q.v", b="c.v")} AS cos_raw
    FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_raw DESC, neighbor_id)::BIGINT AS rank,
           floor(cos_raw * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
    FROM scored
)
SELECT query_id, neighbor_id, rank, cos_sim FROM ranked WHERE rank <= 5
"""


@register("sim1_cosine_topk", SIM1_SQL, survey_ref="north-star ANN: brute-force cosine top-k baseline")
def sim1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    e = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    out = cosine_topk(e.where(F.col("vec_id") < 10), e, k=5)
    return out.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        dround(F.col("cos_sim"), 6).alias("cos_sim"),
    )


# --- SIM2: banded multi-table sign-LSH ANN ---------------------------------
# Hardened for scale (VERDICT r3 item 8): the r2 shape hashed every
# vector with 8 *global* anchor bits — 256 buckets total, so one hot
# region of embedding space degenerates to a quadratic within-bucket
# all-pairs.  Now the candidate generator is dd5's banded machinery
# (operators/dedup.sign_hyperplanes): 4 independent tables × 8-bit
# signatures.  Each table has 256 buckets but a candidate needs
# agreement on all 8 bits OF THAT TABLE — per-table bucket occupancy is
# the binomial tail of 8 hyperplane cuts, so bucket sizes stay bounded
# under skew while the 4 tables recover the recall a single sharper
# table would lose.  Candidate pairs = agree on ≥1 table, deduped
# BEFORE the exact-cosine verify; rank ≤ 3 per query as before.
# tests/test_invariants.py::test_sim2_buckets_bounded pins occupancy.
from ..operators.dedup import sign_hyperplanes  # noqa: E402

_SIM2_DIM, _SIM2_BANDS, _SIM2_ROWS = 64, 4, 8
_SIM2_PLANES = sign_hyperplanes(_SIM2_DIM, _SIM2_BANDS * _SIM2_ROWS)


def _sim2_plane_sql(p: int) -> str:
    return "[" + ", ".join("1.0" if x > 0 else "-1.0" for x in _SIM2_PLANES[p]) + "]"


def _sim2_sig_sql(b: int) -> str:
    return " || ".join(
        f"(CASE WHEN list_inner_product(v, {_sim2_plane_sql(b * _SIM2_ROWS + r)}) > 0"
        " THEN '1' ELSE '0' END)"
        for r in range(_SIM2_ROWS)
    )


def sim2_coded(e: DataFrame) -> DataFrame:
    """(vec_id, band, sig): one row per vector per LSH table."""
    def band_sig(b: int):
        bits = []
        for r in range(_SIM2_ROWS):
            arr = F.array(*[F.lit(x) for x in _SIM2_PLANES[b * _SIM2_ROWS + r]])
            bits.append(F.when(dot(F.col("v"), arr) > 0, "1").otherwise("0"))
        return F.concat(*bits)

    return e.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_sig(b).alias("sig"))
                    for b in range(_SIM2_BANDS)
                ]
            )
        ).alias("bs"),
    ).select("vec_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


SIM2_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
coded AS (
    {" UNION ALL ".join(f"SELECT vec_id, {b} AS band, {_sim2_sig_sql(b)} AS sig FROM e" for b in range(_SIM2_BANDS))}
),
cand AS (
    SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
    FROM coded q JOIN coded c
      ON q.band = c.band AND q.sig = c.sig AND q.vec_id <> c.vec_id
),
scored AS MATERIALIZED (
    SELECT cand.query_id, cand.neighbor_id,
           {_COS_SQL.format(a="qe.v", b="ce.v")} AS cos_raw
    FROM cand
    JOIN e qe ON qe.vec_id = cand.query_id
    JOIN e ce ON ce.vec_id = cand.neighbor_id
),
ranked AS (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_raw DESC, neighbor_id)::BIGINT AS rank,
           floor(cos_raw * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
    FROM scored
)
SELECT query_id, neighbor_id, rank, cos_sim FROM ranked WHERE rank <= 3
"""


@register("sim2_signlsh_ann", SIM2_SQL, survey_ref="north-star ANN: banded multi-table sign-LSH")
def sim2_signlsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    e = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    coded = sim2_coded(e)
    q = coded.select(F.col("vec_id").alias("query_id"), "band", "sig")
    c = coded.select(F.col("vec_id").alias("neighbor_id"), "band", "sig")
    cand = (
        q.join(c, ["band", "sig"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates()  # a pair may collide in several tables — verify once
    )
    qe = e.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    ce = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    scored = (
        cand.join(qe, "query_id")
        .join(ce, "neighbor_id")
        .select(
            "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos_raw")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "rank", dround(F.col("cos_raw"), 6).alias("cos_sim"))
    )


# --- SIM3: per-label centroids (IVF coarse quantizer) ----------------------
SIM3_SQL = """
WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings)
SELECT label, (t.i - 1)::INT AS dim,
       floor(avg(v[t.i]) * 1000000.0 + 0.5) / 1000000.0 AS centroid
FROM e, unnest(range(1, len(v) + 1)) AS t(i)
GROUP BY label, t.i
"""


@register("sim3_label_centroids", SIM3_SQL, survey_ref="north-star ANN: IVF centroid build")
def sim3_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    e = embeddings.select("label", F.col("embedding").cast("array<double>").alias("v"))
    out = label_centroids(e)
    return out.select(
        "label", F.col("dim").cast("int").alias("dim"), dround(F.col("centroid"), 6).alias("centroid")
    )


# --- SIM4: IVF search (assign to nearest cell, probe own cell only) --------
# The scale path sim3's quantizer exists for: cells are broadcast-sized,
# the search is an equi-join on cell id — never an all-pairs scan.
# Centroids are rounded to 6 decimals in BOTH engines before use so the
# assignment argmin sees identical inputs.
SIM4_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
el AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
cent0 AS (
    SELECT label, (t.i - 1)::INT AS dim,
           floor(avg(v[t.i]) * 1000000.0 + 0.5) / 1000000.0 AS c
    FROM el, unnest(range(1, len(v) + 1)) AS t(i)
    GROUP BY label, t.i
),
cent AS (SELECT label, list(c ORDER BY dim) AS cv FROM cent0 GROUP BY label),
dists AS (
    SELECT e.vec_id, e.v, cent.label,
           (list_inner_product(e.v, e.v)
            - 2 * list_inner_product(e.v, cent.cv)
            + list_inner_product(cent.cv, cent.cv)) AS d2
    FROM e CROSS JOIN cent
),
assigned AS MATERIALIZED (
    SELECT vec_id, v, label AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, label) AS rn
        FROM dists
    ) WHERE rn = 1
),
scored AS MATERIALIZED (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_COS_SQL.format(a="q.v", b="c.v")} AS cos_raw
    FROM assigned q JOIN assigned c
      ON q.cell = c.cell AND q.vec_id < 10 AND q.vec_id <> c.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_raw DESC, neighbor_id)::BIGINT AS rank,
           floor(cos_raw * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
    FROM scored
)
SELECT query_id, neighbor_id, rank, cos_sim FROM ranked WHERE rank <= 3
"""


@register("sim4_ivf_search", SIM4_SQL, survey_ref="north-star ANN: IVF nprobe=1 search over sim3 cells")
def sim4_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_assign, ivf_topk

    (embeddings,) = tables(spark, sf_dir, "embeddings")
    e = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    el = embeddings.select("label", F.col("embedding").cast("array<double>").alias("v"))
    cent_arr = (
        label_centroids(el)
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("dim", dround(F.col("centroid"), 6).alias("c"))
                    )
                ),
                lambda s: s.getField("c"),
            ).alias("cv")
        )
    )
    assigned = ivf_assign(e, cent_arr)
    out = ivf_topk(assigned, F.col("id") < 10, k=3)
    return out.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        dround(F.col("cos_raw"), 6).alias("cos_sim"),
    )


# --- SIM5: IVF search with nprobe=2 ----------------------------------------
# The recall dial of sim4: queries probe their TWO nearest cells, the
# corpus stays indexed under its primary cell — recall rises, per-query
# work stays |2 cells|, never the full corpus.
SIM5_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
el AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
cent0 AS (
    SELECT label, (t.i - 1)::INT AS dim,
           floor(avg(v[t.i]) * 1000000.0 + 0.5) / 1000000.0 AS c
    FROM el, unnest(range(1, len(v) + 1)) AS t(i)
    GROUP BY label, t.i
),
cent AS (SELECT label, list(c ORDER BY dim) AS cv FROM cent0 GROUP BY label),
dists AS (
    SELECT e.vec_id, e.v, cent.label,
           (list_inner_product(e.v, e.v)
            - 2 * list_inner_product(e.v, cent.cv)
            + list_inner_product(cent.cv, cent.cv)) AS d2
    FROM e CROSS JOIN cent
),
probes AS MATERIALIZED (
    SELECT vec_id, v, label AS cell, rn AS probe FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, label) AS rn
        FROM dists
    ) WHERE rn <= 2
),
scored AS MATERIALIZED (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {cos} AS cos_raw
    FROM probes q JOIN probes c
      ON q.cell = c.cell AND c.probe = 1 AND q.vec_id < 10 AND q.vec_id <> c.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_raw DESC, neighbor_id)::BIGINT AS rank,
           floor(cos_raw * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
    FROM scored
)
SELECT query_id, neighbor_id, rank, cos_sim FROM ranked WHERE rank <= 3
""".format(cos=_COS_SQL.format(a="q.v", b="c.v"))


@register("sim5_ivf_nprobe2", SIM5_SQL, survey_ref="north-star ANN: IVF nprobe=2 recall dial")
def sim5_ivf_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_assign_probes, ivf_topk_nprobe

    (embeddings,) = tables(spark, sf_dir, "embeddings")
    e = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    el = embeddings.select("label", F.col("embedding").cast("array<double>").alias("v"))
    cent_arr = (
        label_centroids(el)
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("dim", dround(F.col("centroid"), 6).alias("c"))
                    )
                ),
                lambda s: s.getField("c"),
            ).alias("cv")
        )
    )
    probes = ivf_assign_probes(e, cent_arr, nprobe=2)
    out = ivf_topk_nprobe(probes, F.col("id") < 10, k=3)
    return out.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        dround(F.col("cos_raw"), 6).alias("cos_sim"),
    )


# --- SIM6: int8 embedding quantization -------------------------------------
# Scalar symmetric int8 quantization — the storage/ANN compression pass:
# per-vector scale = max|x|/127, q_i = round(x_i/scale) clamped to
# [-127,127], plus the reconstruction MSE.  Entirely map-side HOF
# arithmetic (transform/aggregate): a 100 TB quantization job is a pure
# scan with zero shuffle.  The MSE is expanded as
# (v·v − 2·v·dv + dv·dv)/d with the SAME inner-product association in
# both engines so the doubles agree bit-for-bit before rounding.
SIM6_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (
    SELECT vec_id, v,
           list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
    FROM e WHERE list_max(list_transform(v, x -> abs(x))) > 0
),
q AS (
    SELECT vec_id, v, scale,
           list_transform(v, x ->
               greatest(least(floor(x / scale + 0.5), 127.0), -127.0) * scale)
               AS dv,
           list_transform(v, x ->
               greatest(least(floor(x / scale + 0.5), 127.0), -127.0)) AS qv
    FROM s
)
SELECT vec_id,
       floor(scale * 1000000000.0 + 0.5) / 1000000000.0 AS scale,
       floor(((list_inner_product(v, v) - 2 * list_inner_product(v, dv)
               + list_inner_product(dv, dv)) / len(v))
             * 1000000000.0 + 0.5) / 1000000000.0 AS mse,
       list_max(qv)::INT AS max_q,
       list_min(qv)::INT AS min_q
FROM q
"""


@register("sim6_embedding_quantize", SIM6_SQL, survey_ref="north-star ANN: int8 scalar quantization + reconstruction error")
def sim6_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    s = embeddings.select(
        "vec_id", v.alias("v"), (amax / 127.0).alias("scale")
    ).where(amax > 0)
    qexpr = lambda x: F.greatest(  # noqa: E731
        F.least(F.floor(x / F.col("scale") + 0.5), F.lit(127.0)), F.lit(-127.0)
    )
    q = s.select(
        "vec_id",
        "v",
        "scale",
        F.transform("v", lambda x: qexpr(x) * F.col("scale")).alias("dv"),
        F.transform("v", qexpr).alias("qv"),
    )
    mse = (
        dot(F.col("v"), F.col("v"))
        - 2 * dot(F.col("v"), F.col("dv"))
        + dot(F.col("dv"), F.col("dv"))
    ) / F.size("v")
    return q.select(
        "vec_id",
        dround(F.col("scale"), 9).alias("scale"),
        dround(mse, 9).alias("mse"),
        F.array_max("qv").cast("int").alias("max_q"),
        F.array_min("qv").cast("int").alias("min_q"),
    )


# --- SIM7: metadata-prefiltered ANN ----------------------------------------
# Filtered vector search: top-k cosine neighbors restricted to corpus
# vectors whose document metadata passes a predicate (here lang = 'en').
# Pre-filter beats post-filter at scale: the predicate prunes the corpus
# *before* any distance computation (a semi-join on the id key — at
# 100 TB both sides co-partition on the same key, one shuffle each or
# zero if bucketed), so distances are computed only on qualifying rows,
# and top-k cannot come back short the way post-filtering k' > k can.
SIM7_SQL = f"""
WITH en AS (SELECT doc_id FROM documents WHERE lang = 'en'),
e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    WHERE vec_id IN (SELECT doc_id FROM en)
),
q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 10),
scored AS MATERIALIZED (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_COS_SQL.format(a="q.v", b="c.v")} AS cos_raw
    FROM q JOIN e c ON q.vec_id <> c.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_raw DESC, neighbor_id)::BIGINT AS rank,
           floor(cos_raw * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
    FROM scored
)
SELECT query_id, neighbor_id, rank, cos_sim FROM ranked WHERE rank <= 5
"""


@register("sim7_filtered_ann", SIM7_SQL, survey_ref="north-star ANN: metadata-prefiltered top-k")
def sim7_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    embeddings, documents = tables(spark, sf_dir, "embeddings", "documents")
    en = documents.where(F.col("lang") == "en").select("doc_id")
    corpus = (
        embeddings.join(en, embeddings.vec_id == en.doc_id, "semi")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    queries = embeddings.where(F.col("vec_id") < 10).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    out = cosine_topk(queries, corpus, k=5)
    return out.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        dround(F.col("cos_sim"), 6).alias("cos_sim"),
    )


# --- SIM8: distributed k-means refinement (Lloyd iterations) ---------------
# The learned coarse quantizer the IVF family (sim3-sim5) plugs into:
# two Lloyd iterations from a deterministic seed (the first K corpus
# vectors), each iteration = assign (broadcast centroids, d² in the
# shared expanded form) + per-cell mean (posexplode two-phase avg).
# Per-iteration centroids are floor-rounded to 6 decimals in BOTH
# engines, so the iteration trajectories stay in lockstep and the final
# quantizer is hash-comparable.  The Spark loop is plan composition,
# not driver iteration: 2 shuffles total, centroid frames stay
# broadcast-sized — k-means over 100 TB is ITERS passes over the
# corpus, never corpus² work.
_SIM8_K, _SIM8_ITERS = 8, 2


def _sim8_cent_arrays(cent0: DataFrame) -> DataFrame:
    """(label, dim, c) → (label, cv array) in dim order."""
    return cent0.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", F.col("c")))),
            lambda s: s.getField("c"),
        ).alias("cv")
    )


_SIM8_D2 = (
    "(list_inner_product(e.v, e.v) - 2 * list_inner_product(e.v, c.cv)"
    " + list_inner_product(c.cv, c.cv))"
)


def _sim8_iter_sql(i: int, prev: str) -> str:
    return f"""
d{i} AS (
    SELECT e.vec_id, e.v, c.label, {_SIM8_D2} AS d2
    FROM e CROSS JOIN {prev} c
),
a{i} AS (
    SELECT vec_id, v, label AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, label) AS rn
        FROM d{i}
    ) WHERE rn = 1
),
cent{i}0 AS (
    SELECT cell AS label, (t.i - 1)::INT AS dim,
           floor(avg(v[t.i]) * 1000000.0 + 0.5) / 1000000.0 AS c
    FROM a{i}, unnest(range(1, len(v) + 1)) AS t(i)
    GROUP BY cell, t.i
),
cent{i} AS (SELECT label, list(c ORDER BY dim) AS cv FROM cent{i}0 GROUP BY label)"""


SIM8_SQL = (
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent0 AS (SELECT vec_id AS label, v AS cv FROM e WHERE vec_id < {_SIM8_K}),"""
    + ",".join(
        _sim8_iter_sql(i, f"cent{i - 1}" if i > 1 else "cent0")
        for i in range(1, _SIM8_ITERS + 1)
    )
    + f"""
SELECT label AS cell, dim, c AS centroid FROM cent{_SIM8_ITERS}0
"""
)


@register("sim8_kmeans_refine", SIM8_SQL, survey_ref="north-star ANN: learned IVF quantizer (distributed Lloyd iterations)")
def sim8_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_assign

    (embeddings,) = tables(spark, sf_dir, "embeddings")
    e = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cent = e.where(F.col("vec_id") < _SIM8_K).select(
        F.col("vec_id").alias("label"), F.col("v").alias("cv")
    )
    cent0 = None
    for _ in range(_SIM8_ITERS):
        assigned = ivf_assign(e, cent)
        exploded = assigned.select(
            F.col("cell").alias("label"), F.posexplode("v").alias("dim", "x")
        )
        cent0 = exploded.groupBy("label", "dim").agg(
            dround(F.avg("x"), 6).alias("c")
        )
        cent = _sim8_cent_arrays(cent0)
    return cent0.select(
        F.col("label").alias("cell"), F.col("dim").cast("int").alias("dim"),
        F.col("c").alias("centroid"),
    )


# --- SIM9: two-stage quantized rerank --------------------------------------
# The production ANN serving shape sim6's quantization exists for:
# stage 1 scores EVERY candidate with the int8 codes (4x less memory
# bandwidth than float32; exact BIGINT dot products, so the coarse
# ranking is bit-identical across engines and reduction orders) and
# keeps the top-25 per query; stage 2 re-scores ONLY those 25 with
# exact float cosine and emits the top-5.  At 100 TB the float vectors
# are touched for 25 rows per query instead of the whole corpus — the
# scan is over the int8 sidecar column.  Query side (10 vectors) is
# broadcast; candidate rerank is an equi-join on neighbor_id.  The
# int8 dots are integers < 2^30, exact in either engine's double or
# BIGINT accumulator, so stage-1 candidate sets agree exactly; stage-2
# rounds the cosine to 6 decimals under the measure-zero rule.
SIM9_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (
    SELECT vec_id, v,
           list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
    FROM e WHERE list_max(list_transform(v, x -> abs(x))) > 0
),
q8 AS (
    SELECT vec_id, v,
           list_transform(v, x ->
               greatest(least(floor(x / scale + 0.5), 127.0), -127.0)) AS qv
    FROM s
),
coarse AS MATERIALIZED (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           list_inner_product(q.qv, c.qv)::BIGINT AS coarse_dot
    FROM q8 q JOIN q8 c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
),
cand AS (
    SELECT query_id, neighbor_id, coarse_dot FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY coarse_dot DESC, neighbor_id) AS crn
        FROM coarse
    ) WHERE crn <= 25
),
rerank AS (
    SELECT cand.query_id, cand.neighbor_id, cand.coarse_dot,
           {_COS_SQL.format(a="qe.v", b="ce.v")} AS cos_raw
    FROM cand
    JOIN e qe ON qe.vec_id = cand.query_id
    JOIN e ce ON ce.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, rank, coarse_dot, cos_sim FROM (
    SELECT query_id, neighbor_id, coarse_dot,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_raw DESC, neighbor_id)::BIGINT AS rank,
           floor(cos_raw * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
    FROM rerank
) WHERE rank <= 5
"""


@register("sim9_quantized_rerank", SIM9_SQL, survey_ref="beyond reference: int8-coarse + float-rerank ANN serving")
def sim9_quantized_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    e = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    amax = F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
    scale = (amax / 127.0).alias("scale")
    s = e.select("vec_id", "v", scale).where(amax > 0)
    qv = F.transform(
        F.col("v"),
        lambda x: F.greatest(
            F.least(F.floor(x / F.col("scale") + 0.5), F.lit(127.0)),
            F.lit(-127.0),
        ),
    )
    # int8 codes as doubles: every dot term is an integer < 2^30, exact.
    q8 = s.select("vec_id", "v", qv.alias("qv"))
    queries = q8.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    coarse = (
        F.broadcast(queries)
        .crossJoin(q8.select(F.col("vec_id").alias("neighbor_id"), "qv"))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            dot(F.col("q_qv"), F.col("qv")).cast("long").alias("coarse_dot"),
        )
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("coarse_dot").desc(), F.col("neighbor_id")
    )
    cand = (
        coarse.withColumn("crn", F.row_number().over(wc))
        .where(F.col("crn") <= 25)
        .drop("crn")
    )
    qe = e.select(F.col("vec_id").alias("query_id"), F.col("v").alias("q_v"))
    ce = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("c_v"))
    rerank = (
        cand.join(F.broadcast(qe), "query_id")
        .join(ce, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "coarse_dot",
            cosine(F.col("q_v"), F.col("c_v")).alias("cos_raw"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id")
    )
    return (
        rerank.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            "coarse_dot",
            dround(F.col("cos_raw"), 6).alias("cos_sim"),
        )
    )
