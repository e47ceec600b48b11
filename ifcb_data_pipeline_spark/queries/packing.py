"""Sequence packing: greedy document→training-chunk assignment.

The pre-tokenization packing pass of LLM training pipelines: concatenate
consecutive documents into fixed-token-budget chunks (budget 256 here),
starting a new chunk whenever the next document would overflow.  Packing
is inherently sequential, so it is distributed the way a real pipeline
does it: documents are sharded by contiguous id range (``doc_id // 64``)
and packed greedily *within* each shard — shards are independent, so the
operator is an ``applyInPandas`` over shard groups: one shuffle on the
shard key, then a linear in-memory pass per shard.  At 100 TB the shard
width bounds both state and stragglers; chunk ids are only unique within
a shard, exactly like file-local chunk ids in a sharded tokenizer run.

The oracle expresses the same recurrence as a DuckDB recursive CTE over
per-shard row numbers — greedy packing is a prefix scan with reset,
which plain window functions cannot express.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import token_count_ws
from . import register
from ._util import tables

_BUDGET = 256
_SHARD = 64

PK1_SQL = f"""
WITH RECURSIVE seq AS (
    SELECT doc_id, doc_id // {_SHARD} AS shard,
           least(len(string_split_regex(trim(text), '\\s+')), {_BUDGET})::BIGINT AS tok,
           row_number() OVER (PARTITION BY doc_id // {_SHARD} ORDER BY doc_id) AS rn
    FROM documents
),
pack AS (
    SELECT shard, rn, doc_id, tok, 0::BIGINT AS chunk, tok AS fill
    FROM seq WHERE rn = 1
    UNION ALL
    SELECT s.shard, s.rn, s.doc_id, s.tok,
           CASE WHEN p.fill + s.tok > {_BUDGET} THEN p.chunk + 1 ELSE p.chunk END,
           CASE WHEN p.fill + s.tok > {_BUDGET} THEN s.tok ELSE p.fill + s.tok END
    FROM seq s JOIN pack p ON s.shard = p.shard AND s.rn = p.rn + 1
)
SELECT doc_id, shard::INT AS shard, tok, chunk FROM pack
"""


@register("pk1_sequence_packing", PK1_SQL, survey_ref="north-star: greedy fixed-budget sequence packing")
def pk1_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    base = documents.select(
        "doc_id",
        (F.col("doc_id") / _SHARD).cast("long").cast("int").alias("shard"),
        F.least(token_count_ws(F.col("text")).cast("long"), F.lit(_BUDGET)).alias(
            "tok"
        ),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        chunks = []
        chunk, fill = 0, 0
        for t in pdf["tok"]:
            if fill > 0 and fill + t > _BUDGET:
                chunk += 1
                fill = t
            else:
                fill += t
            chunks.append(chunk)
        pdf["chunk"] = pd.Series(chunks, dtype="int64")
        return pdf

    return base.groupBy("shard").applyInPandas(
        pack, schema="doc_id bigint, shard int, tok bigint, chunk bigint"
    )


# --- PK2: sliding-window document chunking ---------------------------------
# The other half of training-data packing: long documents cut into
# fixed-size token windows with overlap (window 32, stride 24 → 8-token
# overlap), the standard context-window preprocessing for embedding /
# pretraining ingest.  Chunk spans are computed arithmetically per row
# and exploded — the whole operator is a stateless select + explode:
# ZERO shuffles, embarrassingly parallel, linear at any corpus size.
# The tail rule is ceil((n-W)/S): every token lands in at least one
# chunk (the last window may be short), matching the usual tokenizer
# framing.  Chunk content is value-checked via md5 of the joined window
# so the driver hash covers the exact text without hauling long strings.
_CHUNK_W, _CHUNK_S = 32, 24

PK2_SQL = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
spans AS (
    SELECT doc_id, w, t.i AS chunk_idx, (1 + t.i * {_CHUNK_S})::BIGINT AS start_tok
    FROM toks, unnest(range(0,
        ((greatest(len(w) - {_CHUNK_W}, 0) + {_CHUNK_S - 1}) // {_CHUNK_S}) + 1
    )) AS t(i)
)
SELECT doc_id, chunk_idx::INT AS chunk_idx, start_tok,
       len(w[start_tok:start_tok + {_CHUNK_W - 1}])::BIGINT AS n_tok,
       md5(array_to_string(w[start_tok:start_tok + {_CHUNK_W - 1}], ' ')) AS chunk_md5
FROM spans
"""


@register("pk2_document_chunking", PK2_SQL, survey_ref="north-star: sliding-window chunking (context-window ingest)")
def pk2_document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    toks = documents.select("doc_id", F.split("text", " ").alias("w"))
    n_extra = F.expr(
        f"(greatest(size(w) - {_CHUNK_W}, 0) + {_CHUNK_S - 1}) div {_CHUNK_S}"
    )
    spans = toks.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(0).cast("long"), n_extra)).alias("i"),
    )
    start = (1 + F.col("i") * _CHUNK_S).cast("long")
    chunk = F.slice("w", start.cast("int"), _CHUNK_W)
    return spans.select(
        "doc_id",
        F.col("i").cast("int").alias("chunk_idx"),
        start.alias("start_tok"),
        F.size(chunk).cast("long").alias("n_tok"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


# --- PK3: length-bucketed batch assembly -----------------------------------
# The padding-efficiency half of batch assembly: documents are grouped
# into power-of-two length buckets (floor(log2(tok))) so that each
# fixed-size batch (8 docs) pads every member to the batch max — the
# standard length-bucketed batching that keeps padding waste bounded by
# 2x instead of corpus-max.  Distribution follows pk1: batches are
# formed within (bucket, shard = doc_id // 64) ranges, so the
# row_number window is bounded by shard width and no bucket becomes a
# single-reducer global sort at scale.  pad_eff = sum_tok / (n·max_tok)
# is one exact-integer division (measure-zero under round6: tok ratios
# are rationals with denominator n·max ≤ 8·max, never landing on 1e-6
# half-boundaries except at exact terminating values that both engines
# compute identically from the same integers).
PK3_SQL = f"""
WITH toks AS (
    SELECT doc_id, doc_id // {_SHARD} AS shard,
           greatest(len(string_split_regex(trim(text), '\\s+')), 1)::BIGINT AS tok
    FROM documents
),
bucketed AS (
    SELECT doc_id, shard, tok,
           floor(log2(tok::DOUBLE))::BIGINT AS bucket,
           row_number() OVER (
               PARTITION BY floor(log2(tok::DOUBLE))::BIGINT, shard
               ORDER BY doc_id) AS rn
    FROM toks
)
SELECT bucket, shard::INT AS shard, ((rn - 1) // 8)::BIGINT AS batch,
       count(*)::BIGINT AS n_docs,
       max(tok) AS max_tok,
       sum(tok)::BIGINT AS sum_tok,
       floor(sum(tok)::DOUBLE / (count(*) * max(tok)) * 1000000.0 + 0.5)
           / 1000000.0 AS pad_eff
FROM bucketed
GROUP BY bucket, shard, ((rn - 1) // 8)
"""


@register("pk3_length_bucketed_batching", PK3_SQL, survey_ref="beyond reference: length-bucketed batch assembly (padding efficiency)")
def pk3_length_bucketed_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    (documents,) = tables(spark, sf_dir, "documents")
    toks = documents.select(
        "doc_id",
        (F.col("doc_id") / _SHARD).cast("long").cast("int").alias("shard"),
        F.greatest(token_count_ws(F.col("text")).cast("long"), F.lit(1)).alias(
            "tok"
        ),
    )
    bucket = F.floor(F.log2(F.col("tok").cast("double"))).alias("bucket")
    w = Window.partitionBy("bucket", "shard").orderBy("doc_id")
    bucketed = toks.select("doc_id", "shard", "tok", bucket).withColumn(
        "batch", ((F.row_number().over(w) - 1) / 8).cast("long")
    )
    return bucketed.groupBy("bucket", "shard", "batch").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("tok").alias("max_tok"),
        F.sum("tok").cast("long").alias("sum_tok"),
        (
            F.floor(
                F.sum("tok").cast("double")
                / (F.count(F.lit(1)) * F.max("tok"))
                * 1000000.0
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("pad_eff"),
    )
