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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


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
    # agreement join); persist so the corpus→shingle→minhash chain runs
    # once, not three times.
    signatures = signatures.persist()
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
    b) is positive."""
    hashed = shingles.withColumn("h", _hash32(F.col("shingle")))
    # shiftright/shiftleft need literal shift amounts in PySpark; since
    # h < 2^32 the power-of-two arithmetic below is exact in doubles.
    pow2b = F.pow(F.lit(2.0), F.col("b"))
    bit = hashed.select(
        "doc",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
        F.col("h"),
    ).withColumn(
        "contrib",
        F.when((F.col("h") / pow2b).cast("long") % 2 == 1, 1).otherwise(-1),
    )
    sums = bit.groupBy("doc", "b").agg(F.sum("contrib").alias("s"))
    return sums.groupBy("doc").agg(
        F.sum(
            F.when(F.col("s") > 0, F.pow(F.lit(2.0), F.col("b")).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def ngram_jaccard_pairs(
    shingles: DataFrame, threshold: float = 0.3
) -> DataFrame:
    """Exact Jaccard over shingle sets via inverted-index self-join: only
    pairs sharing ≥1 shingle are ever materialized."""
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
