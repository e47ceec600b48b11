"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's exact duplicate detection
(``merge_training_datasets/01_create_file_index.R:88-101``,
``03_delete_duplicates.R:28-60``), these generalize to the fuzzy-dedup
family a 100 TB text corpus needs:

* :func:`exact_dedup`       — hash-groupBy (two-phase aggregation).
* :func:`minhash_signatures`/:func:`minhash_lsh_pairs` — shingle → MinHash
  → banded LSH bucket-join.  The band join shuffles on (band, signature)
  — the classic scalable near-dup plan: candidate generation is a hash
  join on short keys, never an all-pairs product.
* :func:`simhash` — sign-of-weighted-bit-sums fingerprint; near-dups =
  small Hamming distance.
* :func:`ngram_jaccard_pairs` — exact Jaccard via an inverted-index
  self-join (pairs sharing ≥1 shingle), the verification stage after LSH.

All hashing is md5-based (:func:`..queries._util.hash32`) so results are
reproducible across engines and runs — no JVM-specific hash functions.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def sign_hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes for sign-LSH: component ``i`` of plane
    ``p`` is +1 iff the first hex digit of ``md5("p#i")`` is >= '8'.
    Pure-Python md5 → the exact same matrix can be embedded as literals in
    any engine's SQL (the DuckDB oracle mirrors these)."""
    return [
        [
            1.0 if hashlib.md5(f"{p}#{i}".encode()).hexdigest()[0] >= "8" else -1.0
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def embedding_lsh_pairs(
    vectors: DataFrame,
    dim: int,
    bands: int = 4,
    rows_per_band: int = 4,
    threshold: float = 0.95,
    round_digits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Embedding near-duplicate pairs via banded sign-LSH + exact verify.

    The 100 TB-safe plan: candidates come from an equi-join on
    ``(band, sign-signature)`` — linear in corpus size, never an all-pairs
    cross join — and the exact cosine is computed only for candidate
    pairs.  Cosine-identical duplicates (the target of dedup) share every
    sign bit by construction, so recall on true duplicates is 1.0; pairs
    merely *near* the threshold may be missed with probability
    ``(1 - (1 - θ/π)^r)^b`` — the standard, documented ANN trade-off.
    """
    from .similarity import dot

    planes = sign_hyperplanes(dim, bands * rows_per_band)
    # Cross-engine floor-form rounding (see queries._util.dround).
    rf = float(10.0**round_digits)

    def dround(col: Column, _f: float = rf) -> Column:
        return F.floor(col * _f + F.lit(0.5)) / F.lit(_f)

    def band_sig(b: int) -> Column:
        bits = []
        for r in range(rows_per_band):
            arr = F.array(*[F.lit(x) for x in planes[b * rows_per_band + r]])
            bits.append(F.when(dot(F.col(vec_col), arr) > 0, "1").otherwise("0"))
        return F.concat(*bits)

    coded = vectors.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_sig(b).alias("sig"))
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    a = coded.select(F.col("id").alias("vec_a"), "band", "sig")
    b = coded.select(F.col("id").alias("vec_b"), "band", "sig")
    cand = (
        a.join(b, ["band", "sig"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .dropDuplicates()
    )
    ea = vectors.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    eb = vectors.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    cos = dround(
        dot(F.col("va"), F.col("vb"))
        / F.sqrt(dot(F.col("va"), F.col("va")) * dot(F.col("vb"), F.col("vb")))
    )
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group identical texts; keep the min-id row as canonical."""
    hashed = df.withColumn("text_hash", F.md5(F.col(text_col)))
    groups = hashed.groupBy("text_hash").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min(id_col).alias("canonical_id"),
    )
    return hashed.join(groups, "text_hash").select(
        id_col,
        "text_hash",
        "n_copies",
        (F.col(id_col) == F.col("canonical_id")).alias("is_canonical"),
    )


def shingle_sets(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Distinct word k-shingles per document: (id, shingle) rows."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.split(F.lower(F.col(text_col)), " ").alias("w"),
    )
    n = F.size("w")
    sh = toks.select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
                lambda i: F.array_join(F.slice("w", i, k), " "),
            )
        ).alias("shingle"),
    )
    return sh.dropDuplicates(["doc", "shingle"])


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 16
) -> DataFrame:
    """(doc, seed, mh): min over shingles of md5-hash(shingle#seed).

    Computed as ``num_hashes`` parallel ``min`` aggregates over the
    shingle rows (columnar, one shuffle on doc), then unpivoted — NOT by
    exploding shingles × seeds first, which would multiply the fact-table
    row count by ``num_hashes`` before the shuffle."""
    aggs = [
        F.min(
            _hash32(F.concat_ws("#", "shingle", F.lit(str(seed))))
        ).alias(f"mh_{seed}")
        for seed in range(num_hashes)
    ]
    wide = shingles.groupBy("doc").agg(*aggs)
    stack_expr = ", ".join(f"{s}, mh_{s}" for s in range(num_hashes))
    return wide.select(
        "doc",
        F.expr(f"stack({num_hashes}, {stack_expr}) AS (seed, mh)"),
    )


def minhash_lsh_pairs(
    signatures: DataFrame,
    bands: int = 8,
    num_hashes: int = 16,
    est_threshold: float = 0.5,
) -> DataFrame:
    """Banded LSH candidate pairs with estimated Jaccard ≥ threshold.

    Shuffle key = (band, concatenated band-signature) — at scale this is a
    plain hash-join on short strings, linear in corpus size.
    """
    rows_per_band = num_hashes // bands
    # signatures feeds three consumers (banding + both sides of the
    # agreement join); localCheckpoint materializes the
    # corpus→shingle→minhash chain once and — unlike persist(), whose
    # cached blocks would leak with no handle for the caller to release —
    # its blocks are context-cleaned once the returned plan is dropped.
    signatures = signatures.localCheckpoint()
    banded = (
        signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("doc", "band")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(F.struct("seed", "mh"))),
                            lambda s: s.getField("mh").cast("string")),
                ",",
            ).alias("sig")
        )
    )
    a = banded.select(
        F.col("doc").alias("doc_a"), "band", "sig"
    )
    b = banded.select(F.col("doc").alias("doc_b"), "band", "sig")
    cand = (
        a.join(b, ["band", "sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )
    # Estimate Jaccard = fraction of agreeing minhashes.
    sa = signatures.select(F.col("doc").alias("doc_a"), "seed", F.col("mh").alias("mh_a"))
    sb = signatures.select(F.col("doc").alias("doc_b"), "seed", F.col("mh").alias("mh_b"))
    est = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "seed"])
        .groupBy("doc_a", "doc_b")
        .agg(
            (F.sum((F.col("mh_a") == F.col("mh_b")).cast("int")) / num_hashes).alias(
                "est_jaccard"
            )
        )
    )
    return est.where(F.col("est_jaccard") >= est_threshold)


def simhash(shingles: DataFrame, bits: int = 32) -> DataFrame:
    """Per-doc SimHash: bit b set iff sum over shingles of ±1 (by hash bit
    b) is positive.

    Computed as ``bits`` conditional sums in ONE wide ``groupBy(doc)``
    aggregate (the same columnar trick as :func:`minhash_signatures`) —
    never by exploding ``bits`` rows per shingle, which would multiply the
    pre-shuffle row count by ``bits``.  Shuffle rows = |docs|, map-side
    combine does the rest."""
    hashed = shingles.withColumn("h", _hash32(F.col("shingle")))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s_{b}")
        for b in range(bits)
    ]
    sums = hashed.groupBy("doc").agg(*aggs)
    fingerprint = None
    for b in range(bits):
        term = F.when(F.col(f"s_{b}") > 0, F.lit(int(2**b)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fingerprint = term if fingerprint is None else fingerprint + term
    return sums.select("doc", fingerprint.alias("simhash"))


def ngram_jaccard_pairs(
    shingles: DataFrame, threshold: float = 0.3, max_df: int | None = None
) -> DataFrame:
    """Exact Jaccard over shingle sets via inverted-index self-join: only
    pairs sharing ≥1 shingle are ever materialized.

    ``max_df``: drop shingles occurring in more than ``max_df`` documents
    BEFORE the self-join (document-frequency cut).  A ubiquitous shingle
    contributes O(df²) candidate pairs — at 100 TB a single stop-word
    3-gram would dominate the whole shuffle; the cut bounds per-shingle
    fan-out at max_df².  Jaccard is then computed consistently over the
    *filtered* shingle sets (an approximation of the full-set Jaccard;
    ``None`` keeps the exact semantics)."""
    if max_df is not None:
        df_counts = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
        shingles = (
            shingles.join(df_counts.where(F.col("__df") <= max_df), "shingle")
            .drop("__df")
        )
    sizes = shingles.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    a = shingles.select(F.col("doc").alias("doc_a"), "shingle")
    b = shingles.select(F.col("doc").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    na = sizes.select(F.col("doc").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc").alias("doc_b"), F.col("n").alias("nb"))
    j = (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn("jaccard", F.col("i") / (F.col("na") + F.col("nb") - F.col("i")))
    )
    return j.where(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "jaccard"
    )
