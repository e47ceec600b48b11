"""Regression tests for the corpus-derived planted-variant offset.

VERDICT r10 item 6 retired the fixed ``+10000``-style variant-id offsets
(CORPUS_SQL, dd5/dd9/dd10, dd14/dd15 truth edges, i8/tp1/tp2/tp3/tp5)
in favor of ``M = greatest(10000, max(id) + 1)`` derived from the corpus
itself (``queries/dedup.variant_offset``, the dd16 pattern plus a
zero-displacement floor).  The shipped sf dirs can never exercise the
collision branch (max doc_id is 4,999 at sf0.1), so these tests build a
tiny parquet corpus whose ids CROSS 10,000 and prove the property the
migration bought: variant id spaces stay disjoint from real ids at any
corpus size — exactly what the old fixed offset silently violated.

# anchors: dd1 dd9 (variant-id disjointness on an id-range > 10000 corpus)
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ifcb_data_pipeline_spark.queries import load_all
from ifcb_data_pipeline_spark.queries.dedup import (
    _VARIANT_M,
    corpus_df,
    variant_offset,
)

REG = load_all()


@pytest.fixture(scope="module")
def big_id_dir(tmp_path_factory):
    """A documents table whose doc_ids straddle 10,000 — the range where
    the retired fixed offset aliased variants onto real documents."""
    d = tmp_path_factory.mktemp("bigids")
    ids = list(range(9_975, 10_051))  # 76 docs, crosses 10,000
    rows = {
        "doc_id": ids,
        "text": [f"alpha beta gamma delta epsilon zeta eta theta doc {i}" for i in ids],
        "lang": ["en"] * len(ids),
        "source": [f"src{i % 3}" for i in ids],
    }
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    return str(d)


def test_variant_offset_floor_at_shipped_sf(spark):
    # at every shipped SF the floor pins M to exactly 10000 — the
    # zero-displacement guarantee the round-11 migration relies on
    assert variant_offset(spark, "/root/testdata/sf0.001") == 10000
    assert variant_offset(spark, "/root/testdata/sf0.01") == 10000


def test_variant_offset_derives_past_the_floor(spark, big_id_dir):
    m = variant_offset(spark, big_id_dir)
    assert m == 10_051, "M must clear the corpus max, not sit at the floor"


def test_variant_offset_memoized(spark, big_id_dir):
    variant_offset(spark, big_id_dir)
    assert (big_id_dir, "documents") in _VARIANT_M


def test_corpus_variants_disjoint_from_real_ids(spark, big_id_dir):
    rows = corpus_df(spark, big_id_dir).select("doc").collect()
    got = [r["doc"] for r in rows]
    real = set(range(9_975, 10_051))
    variants = [d for d in got if d not in real]
    # with the OLD fixed +10000: doc 0? none here, but docs 9975..10050
    # planted variants at 19975..20050 — while REAL ids 10000..10050
    # sat inside the old variant test thresholds; worse, a corpus with
    # ids >= 10000 could collide id d+10000 with a real doc.  Derived M
    # makes every variant id >= M > max(real).
    m = variant_offset(spark, big_id_dir)
    assert variants, "planted variants must exist (ids % 25 == 0 present)"
    assert all(d >= m for d in variants)
    assert len(got) == len(set(got)), "no id collisions anywhere"


def test_dd1_groups_on_big_id_corpus(spark, big_id_dir):
    # dd1 end-to-end on the straddling corpus: every doc appears once,
    # ids never alias (the old-offset failure mode was double-counted
    # "copies" when a variant id hit a real id)
    out = REG["dd1_exact_dedup"].fn(spark, big_id_dir).collect()
    docs = [r["doc"] for r in out]
    assert len(docs) == len(set(docs))
    m = variant_offset(spark, big_id_dir)
    n_variants = sum(1 for d in docs if d >= m)
    n_expected = sum(1 for i in range(9_975, 10_051) if i % 25 == 0)
    assert n_variants == n_expected
