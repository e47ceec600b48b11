"""Property-based and data-wide invariant tests (SURVEY §5).

Invariants from the reference's semantics: per-class counts must sum to
the per-sample ROI count, split-union must preserve rows, per-liter
math must be consistent, every output row must trace to an input key.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ifcb_data_pipeline_spark.queries import load_all
from ifcb_data_pipeline_spark.sources.tables import load_table

REGISTRY = load_all()


def test_rollup_counts_partition_roi_count(spark, sf_dir):
    # anchors: a1 (biovolume rollup counts partition the ROI universe)
    """Σ per-(sample,class) counts == total qualifying per-ROI rows."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    expected = lineitem.where(F.col("l_quantity") > 1).count()
    rolled = REGISTRY["a1_biovolume_rollup"].fn(spark, sf_dir)
    assert rolled.agg(F.sum("counts")).first()[0] == expected


def test_split_union_preserves_rows(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    out = REGISTRY["o5_split_apply_union"].fn(spark, sf_dir)
    assert out.count() == lineitem.count()


def test_per_liter_math_consistency(spark, sf_dir):
    # anchors: a1 (per-liter normalization recomputed row-by-row)
    """counts_per_liter == counts * 1000 / ml for every row (A1 law)."""
    rolled = REGISTRY["a1_biovolume_rollup"].fn(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("sample"),
        (F.col("o_totalprice") / 1000.0).alias("ml"),
    )
    joined = rolled.join(orders, "sample")
    bad = joined.where(
        F.abs(
            F.col("counts_per_liter") - F.col("counts") * 1000.0 / F.col("ml")
        )
        > 1e-3
    )
    assert bad.count() == 0


def test_join_key_integrity(spark, sf_dir):
    """Every flagship output row traces to a real order (bin)."""
    out = REGISTRY["p1_shark_export"].fn(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("sample")
    )
    orphans = out.join(orders, "sample", "left_anti")
    assert orphans.count() == 0


def test_dedup_exact_groups_consistent(spark, sf_dir):
    # anchors: dd1 (exact-dup groups recomputed from raw hashes)
    """Each hash group has exactly one canonical row and n_copies
    equals the group size."""
    out = REGISTRY["dd1_exact_dedup"].fn(spark, sf_dir)
    groups = out.groupBy("text_hash").agg(
        F.count(F.lit(1)).alias("size"),
        F.first("n_copies").alias("claimed"),
        F.sum(F.col("is_canonical").cast("int")).alias("n_canonical"),
    )
    assert groups.where(
        (F.col("size") != F.col("claimed")) | (F.col("n_canonical") != 1)
    ).count() == 0


@settings(max_examples=30, deadline=None)
@given(
    x=st.floats(
        min_value=1e-6, max_value=1e12, allow_nan=False, allow_infinity=False
    )
)
def test_signif_property(x):
    """signif(x, 3) keeps the first 3 significant digits and stays within
    0.5 ulp-of-third-digit of x (pure-python mirror of the column expr)."""
    import math

    mag = math.floor(math.log10(abs(x)))
    rounded = math.floor((x / 10**mag) * 100 + 0.5) / 100 * 10**mag
    assert abs(rounded - x) <= 0.5 * 10 ** (mag - 2) * 1.0000001
    # Idempotence.
    mag2 = math.floor(math.log10(abs(rounded)))
    again = math.floor((rounded / 10**mag2) * 100 + 0.5) / 100 * 10**mag2
    assert again == rounded or abs(again - rounded) < 1e-12 * abs(rounded)


def test_signif_matches_duckdb_on_boundary_values(spark):
    """ADVICE r1: F.round-based signif diverged from the oracle on
    boundary inputs like 1005.0 (floor-form 1000.0 vs HALF_UP 1010.0),
    masked by data luck.  Drive the floor-form signif through BOTH
    engines on adversarial half-way values and exact powers."""
    import duckdb

    values = [
        1005.0, 15139.495, 999.995, 0.0010005, 123456.5, 2.5, -1005.0,
        0.5, 1.0, 10.0, 99999.5, 0.000123455, 7777.77, 1e-7, 123.456789,
    ]
    from ifcb_data_pipeline_spark.functions.scalars import signif

    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i int, x double")
    got = {
        r.i: r.s
        for r in df.select("i", signif(F.col("x"), 3).alias("s")).collect()
    }
    con = duckdb.connect()
    sql = """
        SELECT i, CASE WHEN x = 0 THEN x
               ELSE floor((x / pow(10.0, floor(log10(abs(x))))) * 100.0 + 0.5)
                    / 100.0 * pow(10.0, floor(log10(abs(x))))
               END AS s
        FROM df
    """
    import pandas as pd

    con.register("df", pd.DataFrame({"i": range(len(values)), "x": values}))
    want = {int(i): s for i, s in con.execute(sql).fetchall()}
    assert got == want


def test_ivf_nprobe_recall_monotone(spark, sf_dir):
    # anchors: sim1 sim4 (exact top-k is the recall truth; IVF nprobe law)
    """Probing more cells can only help: recall@3 of nprobe=2 (sim5)
    vs the exact top-3 (sim1) is >= that of nprobe=1 (sim4)."""
    from ifcb_data_pipeline_spark.queries import load_all

    reg = load_all()

    def topk(name):
        rows = reg[name].fn(spark, sf_dir).collect()
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    exact = topk("sim1_cosine_topk")
    p1, p2 = topk("sim4_ivf_search"), topk("sim5_ivf_nprobe2")

    def recall(approx):
        hits = total = 0
        for q, t in exact.items():
            total += len(t)
            hits += len(t & approx.get(q, set()))
        return hits / total

    assert recall(p2) >= recall(p1)


def test_sim2_buckets_bounded(spark, sf_dir):
    """sim2's banded sign-LSH must keep per-table bucket occupancy
    bounded (the scale contract of the r4 rewrite): no single (band,
    sig) bucket may hold more than 10% of the corpus, and the deduped
    candidate-pair count must stay far below all-pairs — the properties
    that prevent a quadratic within-bucket blowup under skew."""
    from ifcb_data_pipeline_spark.queries.similarity import sim2_coded

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = e.count()
    coded = sim2_coded(e)
    max_bucket = (
        coded.groupBy("band", "sig").count().agg(F.max("count")).first()[0]
    )
    assert max_bucket <= max(8, n * 0.10), f"hot bucket: {max_bucket} of {n}"
    q = coded.select(F.col("vec_id").alias("a"), "band", "sig")
    c = coded.select(F.col("vec_id").alias("b"), "band", "sig")
    cand = (
        q.join(c, ["band", "sig"]).where(F.col("a") != F.col("b"))
        .select("a", "b").dropDuplicates().count()
    )
    assert cand <= 0.05 * n * (n - 1), f"candidate pairs {cand} ~ all-pairs ({n})"


def test_pk2_chunks_cover_every_token(spark, sf_dir):
    """pk2's ceil tail rule: for every document the last chunk must reach
    the final token (start + n_tok - 1 == n), chunk starts advance by the
    stride, and every chunk except the last is full-width."""
    from pyspark.sql import functions as F

    from ifcb_data_pipeline_spark.queries import load_all
    from ifcb_data_pipeline_spark.queries.packing import _CHUNK_S, _CHUNK_W

    reg = load_all()
    out = reg["pk2_document_chunking"].fn(spark, sf_dir)
    per_doc = (
        out.groupBy("doc_id")
        .agg(
            F.max(F.col("start_tok") + F.col("n_tok") - 1).alias("covered"),
            F.max("chunk_idx").alias("last_idx"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(
                F.when(F.col("n_tok") < _CHUNK_W, 1).otherwise(0)
            ).alias("n_short"),
        )
    )
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
    )
    j = per_doc.join(docs, "doc_id")
    assert j.where(F.col("covered") != F.col("n")).count() == 0, (
        "a document's tail tokens fall outside every chunk"
    )
    assert j.where(F.col("n_chunks") != F.col("last_idx") + 1).count() == 0
    # only the final (tail) chunk may be short, and only when the doc
    # isn't stride-aligned
    assert j.where(F.col("n_short") > 1).count() == 0
    # starts advance by exactly the stride
    gaps = (
        out.groupBy("doc_id", "chunk_idx").count()
        .where(F.col("count") != 1)
    )
    assert gaps.count() == 0
    assert (
        out.where(F.col("start_tok") != 1 + F.col("chunk_idx") * _CHUNK_S).count()
        == 0
    )


def test_sp5_realized_mixture_follows_temperature(spark, sf_dir):
    """sp5's realized per-domain row counts must track n_docs * w with
    the hash gate accounting for the fractional part: the replicated
    count sits within the integer envelope [n*floor(w), n*ceil(w)], and
    rarer domains get strictly larger factors (inverse-sqrt monotone)."""
    from pyspark.sql import functions as F

    from ifcb_data_pipeline_spark.queries import load_all

    reg = load_all()
    out = reg["sp5_temperature_resampling"].fn(spark, sf_dir)
    realized = out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"), F.first("w").alias("w")
    )
    src = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    rows = {r["source"]: r for r in realized.join(src, "source").collect()}
    assert rows
    for r in rows.values():
        floor_w = int(r["w"])  # w is rounded to 6dp in the output; floor is safe
        assert r["n_rows"] >= r["n_docs"] * floor_w, r
        assert r["n_rows"] <= r["n_docs"] * (floor_w + 1), r
    by_n = sorted(rows.values(), key=lambda r: r["n_docs"])
    ws = [r["w"] for r in by_n]
    # inverse-sqrt of share → weakly decreasing in domain size (ties when
    # both hit the 4.0 cap)
    assert all(a >= b - 1e-9 for a, b in zip(ws, ws[1:])), ws


def test_sim9_rerank_recall_vs_exact(spark, sf_dir):
    """The sim9 contract: the int8 coarse stage's top-25 must retain
    (nearly) all of the exact float top-5 — quantization error is a
    rounding of 64-dim dots, far smaller than typical neighbor gaps.
    Pinned at mean recall >= 0.9 (observed 1.0 at sf0.01); a drop means
    the coarse scorer or the candidate width regressed."""
    from ifcb_data_pipeline_spark.queries import load_all

    reg = load_all()
    exact = reg["sim1_cosine_topk"].fn(spark, sf_dir).collect()
    rr = reg["sim9_quantized_rerank"].fn(spark, sf_dir).collect()
    ex: dict[int, set] = {}
    for r in exact:
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got: dict[int, set] = {}
    for r in rr:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(ex[q] & got[q]) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_sp6_budget_binding_and_maximal(spark, sf_dir):
    """Every kept domain prefix must respect the budget AND be maximal:
    the next doc in hash order would cross it (so the cap actually
    trims, and trims no more than necessary)."""
    from ifcb_data_pipeline_spark.queries import load_all
    from ifcb_data_pipeline_spark.queries.text import _SP6_BUDGET

    reg = load_all()
    kept = reg["sp6_domain_token_cap"].fn(spark, sf_dir).collect()
    by_src: dict[str, int] = {}
    for r in kept:
        assert r["cum_tok"] <= _SP6_BUDGET
        by_src[r["source"]] = max(by_src.get(r["source"], 0), r["cum_tok"])
    # maximality: re-derive the full hash-ordered token series per domain
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    rows = con.execute(
        """
        SELECT source, list(tok ORDER BY h, doc_id) FROM (
            SELECT doc_id, source,
                   len(string_split_regex(trim(text), '\\s+'))::BIGINT AS tok,
                   ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS h
            FROM documents
        ) GROUP BY source
        """
    ).fetchall()
    for source, toks in rows:
        cum, kept_cum = 0, by_src.get(source, 0)
        for t in toks:
            if cum + t > _SP6_BUDGET:
                break
            cum += t
        assert cum == kept_cum, f"{source}: kept {kept_cum}, maximal is {cum}"


def test_dd16_survivor_is_quality_argmax_not_min_id(spark, sf_dir):
    """The survivor rule must (a) pick exactly one keeper per group,
    (b) always a max-quality copy with min-doc tie-break, and (c) PROVABLY
    diverge from dd9's min-id rule: the variant corpus replaces every 10th
    doc with two mangled re-crawls where the cleaner copy has the HIGHER
    id, so most multi-copy groups must crown a non-min doc."""
    from ifcb_data_pipeline_spark.queries import load_all

    rows = load_all()["dd16_quality_survivor"].fn(spark, sf_dir).collect()
    by_group: dict[str, list] = {}
    for r in rows:
        by_group.setdefault(r["norm_hash"], []).append(r)
    diverged = multi = 0
    for members in by_group.values():
        keepers = [r for r in members if r["is_kept"]]
        assert len(keepers) == 1, "exactly one survivor per group"
        k = keepers[0]
        max_q = max(r["q_u"] for r in members)
        assert k["q_u"] == max_q, "survivor must hold max quality"
        assert k["doc"] == min(
            r["doc"] for r in members if r["q_u"] == max_q
        ), "tie-break must be min doc among max-quality copies"
        if len(members) > 1:
            multi += 1
            if k["doc"] != min(r["doc"] for r in members):
                diverged += 1
    assert multi >= 10, "variant corpus must create duplicate groups"
    assert diverged >= multi * 0.8, (
        f"quality rule should beat min-id in most groups ({diverged}/{multi})"
    )


def test_sp10_accounting_and_contamination_semantics(spark, sf_dir):
    # anchors: sp1 (per-language accounting tied out against the raw split)
    """Per-language accounting must tie out against the raw sp1 split, and
    a directly-recomputed contaminated set (train∩test 4-gram overlap)
    must equal what the query dropped."""
    import duckdb

    from ifcb_data_pipeline_spark.queries import load_all

    out = {
        r["lang"]: r
        for r in load_all()["sp10_decontaminated_split"].fn(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    truth = con.execute(
        """
        WITH split AS (
            SELECT doc_id, lang, text,
                   CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                             % 100 < 80 THEN 'train' ELSE 'test' END AS split
            FROM documents
        ),
        toks AS (SELECT doc_id, split, string_split(lower(text), ' ') AS w FROM split),
        sh AS (
            SELECT DISTINCT doc_id, split, array_to_string(w[i:i+3], ' ') AS g
            FROM toks, unnest(range(1, greatest(len(w) - 4, 0) + 2)) AS t(i)
        ),
        contam AS (
            SELECT DISTINCT s.doc_id FROM sh s
            JOIN (SELECT DISTINCT g FROM sh WHERE split = 'test') tg USING (g)
            WHERE s.split = 'train'
        )
        SELECT sp.lang,
               sum(CASE WHEN sp.split = 'test' THEN 1 ELSE 0 END) AS n_test,
               sum(CASE WHEN sp.split = 'train' THEN 1 ELSE 0 END) AS n_train,
               sum(CASE WHEN sp.split = 'train' AND c.doc_id IS NOT NULL
                        THEN 1 ELSE 0 END) AS n_dropped
        FROM split sp LEFT JOIN contam c USING (doc_id) GROUP BY sp.lang
        """
    ).fetchall()
    assert truth and len(truth) == len(out)
    for lang, n_test, n_train, n_dropped in truth:
        r = out[lang]
        assert r["n_test"] == n_test
        assert r["n_train_kept"] + r["n_train_dropped"] == n_train
        assert r["n_train_dropped"] == n_dropped
    assert any(r["n_train_dropped"] > 0 for r in out.values()), (
        "corpus must exhibit some contamination for the guard to be exercised"
    )


def test_a27_cohort_triangle_shape(spark, sf_dir):
    """Structural retention-triangle laws: age-0 retention is exactly 1
    for every cohort (the cohort IS its own day-0 active set), ages are
    non-negative, no (cohort, age) cell exceeds its cohort size, and
    cohort sizes sum to the stream's distinct-user count."""
    import duckdb

    from ifcb_data_pipeline_spark.queries import load_all

    rows = load_all()["a27_retention_cohorts"].fn(spark, sf_dir).collect()
    assert rows
    seen_cohorts = {}
    for r in rows:
        assert r["age"] >= 0
        assert 0 < r["n_active"] <= r["n_cohort"]
        if r["age"] == 0:
            assert r["n_active"] == r["n_cohort"] and r["retention"] == 1.0
        seen_cohorts[r["cohort_day"]] = r["n_cohort"]
    assert all(
        any(r["cohort_day"] == c and r["age"] == 0 for r in rows)
        for c in seen_cohorts
    ), "every cohort must have its age-0 row"
    con = duckdb.connect()
    n_users = con.execute(
        f"SELECT count(DISTINCT user_id) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert sum(seen_cohorts.values()) == n_users


def test_tx14_pure_python_logit_recompute(spark, sf_dir):
    """Third-layer law anchor: the frozen-classifier logit re-derived in
    pure Python (same quantize-then-integer-arithmetic pipeline) must
    match every output row exactly, keep must equal logit >= 0, and the
    corpus must split into a genuine keep/drop mix."""
    import math

    import duckdb

    from ifcb_data_pipeline_spark.operators.text import STOPWORDS

    rows = {
        r["doc_id"]: r
        for r in REGISTRY["tx14_quality_model_score"].fn(spark, sf_dir).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    assert len(rows) == len(docs)
    sw = set(STOPWORDS)
    n_keep = 0
    for doc_id, text in docs:
        toks = text.lower().split(" ")
        n = len(toks)
        stop_u = math.floor(sum(t in sw for t in toks) * 1.0 / n * 1e6 + 0.5)
        ttr_u = math.floor(len(set(toks)) * 1.0 / n * 1e6 + 0.5)
        mtl_u = math.floor(sum(len(t) for t in toks) * 1.0 / n * 1e6 + 0.5)
        z2_u = 40 * stop_u + 4 * ttr_u + 20000 * n - mtl_u - 1000000
        r = rows[doc_id]
        assert r["logit"] == z2_u / 2e6, f"doc {doc_id}"
        assert r["keep"] == (z2_u >= 0), f"doc {doc_id}"
        assert r["n_tokens"] == n
        n_keep += r["keep"]
    assert 0 < n_keep < len(docs), "weights must produce a keep/drop MIX"


def test_dp11_psi_recompute_and_plant(spark, sf_dir):
    """PSI re-derived by a pure-Python histogram loop (Laplace-smoothed,
    per-term pico-quantized exactly like both engines) must match; only
    the planted 'click' late-window shift may flag drifted; PSI >= 0
    always ((p-q) and ln(p/q) share sign term-wise)."""
    import math

    import duckdb

    out = {
        r["event_type"]: r
        for r in REGISTRY["dp11_psi_drift"].fn(spark, sf_dir).collect()
    }
    ev = duckdb.sql(
        f"SELECT event_type, ts, value FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    from collections import defaultdict

    ce = defaultdict(int)
    cl = defaultdict(int)
    cut = "2024-01-16"
    for et, ts, v in ev:
        early = ts.strftime("%Y-%m-%d %H:%M:%S") < cut + " 00:00:00"
        vv = v if (early or et != "click") else v + 40.0
        b = min(max(int(math.floor(vv / 50.0)), 0), 9)
        (ce if early else cl)[(et, b)] += 1
    types = sorted(out)
    for et in types:
        te = sum(ce[(et, b)] for b in range(10))
        tl = sum(cl[(et, b)] for b in range(10))
        psi_u = 0
        for b in range(10):
            p = (ce[(et, b)] + 1.0) / (te + 10.0)
            q = (cl[(et, b)] + 1.0) / (tl + 10.0)
            psi_u += math.floor((p - q) * math.log(p / q) * 1e12 + 0.5)
        r = out[et]
        assert r["n_early"] == te and r["n_late"] == tl
        assert r["psi"] == math.floor(psi_u / 1e12 * 1e6 + 0.5) / 1e6, et
        assert r["psi"] >= 0.0
        assert r["drifted"] == (psi_u >= 100000000000), et
    assert out["click"]["drifted"], "planted click shift must flag"
    assert all(not out[et]["drifted"] for et in types if et != "click"), (
        "stationary types must not flag"
    )


def test_dd17_pure_python_containment_recompute(spark):
    """Full pure-Python replay of the substring-dedup pipeline at
    sf0.001 (6-gram shingles, df<=20 cut, containment>=0.5 candidates,
    max-shared/min-container resolution) — the Spark output must equal
    the replay row-for-row, and every planted truncation that appears
    must be a full-coverage drop."""
    import math
    from collections import defaultdict

    import duckdb

    sf = "/root/testdata/sf0.001"
    docs = duckdb.sql(f"SELECT doc_id, text FROM '{sf}/documents.parquet'").fetchall()
    m = max(10000, max(d for d, _ in docs) + 1)  # engine's derived offset
    corpus = {d: t.lower() for d, t in docs}
    for d, t in docs:
        if d % 25 == 0:
            w = t.lower().split(" ")
            keep = max((len(w) * 7) // 10, 1)
            corpus[d + m] = " ".join(w[:keep])
    sh = {}
    for d, t in corpus.items():
        w = t.split(" ")
        n = len(w)
        sh[d] = {" ".join(w[i : i + 6]) for i in range(max(n - 5, 1))}
    df_cnt = defaultdict(int)
    for s in sh.values():
        for g in s:
            df_cnt[g] += 1
    kept = {d: {g for g in s if df_cnt[g] <= 20} for d, s in sh.items()}
    inv = defaultdict(list)
    for d, s in kept.items():
        for g in s:
            inv[g].append(d)
    shared = defaultdict(int)
    for g, ds in inv.items():
        ds = sorted(ds)
        for i, b in enumerate(ds):
            for a in ds[i + 1 :]:
                shared[(a, b)] += 1
    cand = {
        (a, b): (i, len(kept[a]), i * 1.0 / len(kept[a]))
        for (a, b), i in shared.items()
        if len(kept[a]) and i * 1.0 / len(kept[a]) >= 0.5
    }
    best = defaultdict(lambda: (0, None))
    for (a, b), (i, n, cov) in sorted(cand.items()):
        mx, cont = best[a]
        if i > mx or (i == mx and (cont is None or b < cont)):
            best[a] = (i, b)
    expected = {}
    for a, (mx, b) in best.items():
        i, n, cov = cand[(a, b)]
        expected[a] = (b, n, i, math.floor(cov * 1e6 + 0.5) / 1e6, cov >= 0.8)

    from ifcb_data_pipeline_spark.queries import load_all

    got = {
        r["doc"]: (
            r["container"],
            r["n_shingles"],
            r["n_shared"],
            r["coverage"],
            r["drop_doc"],
        )
        for r in load_all()["dd17_shingle_containment"].fn(spark, sf).collect()
    }
    assert got == expected
    # ADVICE r9: derive the planted-id set from the replay's own corpus
    # construction rather than a `>= 10000` threshold — the threshold
    # inherits CORPUS_SQL's fixed offset and would silently misclassify
    # natural docs once a corpus's id range reaches 10000.
    planted_ids = {d + m for d, _ in docs if d % 25 == 0}
    planted = [d for d in got if d in planted_ids]
    assert len(planted) >= 15, "most planted truncations must be caught"
    for d in planted:
        assert got[d][3] == 1.0 and got[d][4], (
            "a truncation's shingles are a subset of its source's — "
            "coverage must be exactly 1.0 and the verdict a drop"
        )


def test_sp11_balance_and_membership(spark, sf_dir):
    """Balance law: every class lands exactly min-class-size rows; the
    selected members and ranks equal a pure-Python md5-hash-ranked draw."""
    import hashlib
    from collections import defaultdict

    import duckdb

    rows = REGISTRY["sp11_class_balanced_resample"].fn(spark, sf_dir).collect()
    docs = duckdb.sql(
        f"SELECT doc_id, lang FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    by_lang = defaultdict(list)
    for doc_id, lang in docs:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        by_lang[lang].append((h, doc_id))
    min_n = min(len(v) for v in by_lang.values())
    expected = {}
    for lang, hs in by_lang.items():
        for rank, (h, doc_id) in enumerate(sorted(hs)[:min_n], start=1):
            expected[doc_id] = (lang, rank, len(hs), min_n)
    got = {
        r["doc_id"]: (r["lang"], r["rank_in_class"], r["class_n"], r["sampled_n"])
        for r in rows
    }
    assert got == expected
    per_class = defaultdict(int)
    for lang, *_ in got.values():
        per_class[lang] += 1
    assert set(per_class.values()) == {min_n}, "classes must be exactly balanced"


def test_dd18_pure_python_url_canonicalization_recompute(spark, sf_dir):
    """Full pure-Python replay of the URL synthesis + CCNet
    canonicalization chain: rebuild every variant URL from (doc_id,
    source, lang), canonicalize with str ops (no regex), group by
    canonical URL then host — the Spark host-level report must match
    row-for-row, and the dup ledger must balance
    (n_dup_docs == n_docs - n_canon_urls, summed across hosts ==
    total docs - total canonical URLs)."""
    import duckdb
    from collections import defaultdict

    rows = {
        r["host"]: r
        for r in REGISTRY["dd18_url_host_dedup"].fn(spark, sf_dir).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, source, lang FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    groups = defaultdict(list)
    for d, src, lang in docs:
        url = (
            ("HTTPS://" if d % 2 == 0 else "http://")
            + ("www." if d % 3 == 0 else "")
            + (src.upper() if d % 2 == 0 else src)
            + ".example.org/"
            + lang
            + "/page"
            + str(d % 7)
            + ("/" if d % 5 == 0 else "")
            + ("?utm_source=rss&ref=feed" if d % 4 == 0 else "")
            + ("#section2" if d % 11 == 0 else "")
        )
        u = url.lower()
        for pre in ("https://", "http://"):
            if u.startswith(pre):
                u = u[len(pre):]
        u = u.split("#", 1)[0].split("?", 1)[0]
        if u.startswith("www."):
            u = u[4:]
        u = u[:-1] if u.endswith("/") else u
        groups[u].append(d)
    hosts = defaultdict(lambda: [0, 0, 1 << 62])
    for canon, ds in groups.items():
        h = canon.split("/", 1)[0]
        hosts[h][0] += len(ds)
        hosts[h][1] += 1
        hosts[h][2] = min(hosts[h][2], min(ds))
    assert set(rows) == set(hosts)
    for h, (n_docs, n_urls, first) in hosts.items():
        r = rows[h]
        assert (r["n_docs"], r["n_canon_urls"], r["first_doc"]) == (
            n_docs,
            n_urls,
            first,
        ), h
        assert r["n_dup_docs"] == n_docs - n_urls, h
    assert sum(r["n_docs"] for r in rows.values()) == len(docs)
    assert sum(r["n_dup_docs"] for r in rows.values()) == len(docs) - len(groups)
    assert sum(r["n_dup_docs"] for r in rows.values()) > 0, (
        "variant axes must produce at least one URL-level duplicate"
    )


def test_dd19_pure_python_span_recompute(spark, sf_dir):
    """Repeated-trigram spans re-derived by a per-doc Python loop with
    explicit char-offset bookkeeping must equal the Spark manifest
    exactly; every span's char window must reproduce its gram when cut
    from the original text (the whole point of emitting offsets)."""
    import duckdb
    from collections import defaultdict

    got = {
        (r["doc_id"], r["gram"]): (
            r["n_occ"],
            r["first_pos"],
            r["last_pos"],
            r["first_char_start"],
            r["last_char_end"],
        )
        for r in REGISTRY["dd19_repeated_ngram_spans"].fn(spark, sf_dir).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    expected = {}
    texts = dict(docs)
    for d, t in docs:
        ws = t.split(" ")
        occ = defaultdict(list)
        cs = 0
        offsets = []
        for w in ws:
            offsets.append(cs)
            cs += len(w) + 1
        for i in range(len(ws) - 2):
            occ[" ".join(ws[i : i + 3])].append(i)
        for g, ps in occ.items():
            if len(ps) >= 2:
                expected[(d, g)] = (
                    len(ps),
                    ps[0],
                    ps[-1],
                    offsets[ps[0]],
                    offsets[ps[-1]] + len(g),
                )
    assert got == expected
    assert expected, "natural data must contain repeated trigrams"
    for (d, g), (_, _, _, c0, c1) in expected.items():
        assert texts[d][c0 : c0 + len(g)] == g
        assert texts[d][c1 - len(g) : c1] == g


def test_tx15_fertility_recompute(spark, sf_dir):
    """Per-lang token/subword/char sums re-derived by a Python loop must
    match exactly; fertility and chars_per_token must equal the 6dp
    floor-quantized ratios of those exact integers; ceil(len/4) law:
    subwords-per-word ∈ [1, ceil(maxlen/4)] and total_subwords <=
    total_chars (every unit covers >= 1 char)."""
    import duckdb
    import math
    from collections import defaultdict

    rows = {
        r["lang"]: r
        for r in REGISTRY["tx15_tokenizer_fertility"].fn(spark, sf_dir).collect()
    }
    docs = duckdb.sql(
        f"SELECT lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    acc = defaultdict(lambda: [0, 0, 0, 0])
    for lang, t in docs:
        ws = t.split(" ")
        a = acc[lang]
        a[0] += 1
        a[1] += len(t)
        a[2] += len(ws)
        a[3] += sum((len(w) + 3) // 4 for w in ws)
    assert set(rows) == set(acc)
    for lang, (nd, nc, nt, nsub) in acc.items():
        r = rows[lang]
        assert (
            r["n_docs"],
            r["total_chars"],
            r["total_ws_tokens"],
            r["total_subwords"],
        ) == (nd, nc, nt, nsub), lang
        assert r["fertility"] == math.floor(nsub / nc * 1e6 + 0.5) / 1e6
        assert r["chars_per_token"] == math.floor(nc / nt * 1e6 + 0.5) / 1e6
        assert nsub <= nc and nsub >= nt, "unit-coverage law"


def test_dp12_decile_recompute_translation_and_plant(spark, sf_dir):
    """Deciles re-derived by Python sorts (rank floor((n-1)k/10)+1 on
    the planted values) must match max_decile_shift exactly; the
    translation-equivariance law: click's late deciles equal its
    UNshifted late deciles + 40 exactly, so click must flag and
    stationary types must not."""
    import duckdb
    from collections import defaultdict

    rows = {
        r["event_type"]: r
        for r in REGISTRY["dp12_quantile_drift_gate"].fn(spark, sf_dir).collect()
    }
    ev = duckdb.sql(
        f"SELECT event_type, ts, value FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    pools = defaultdict(list)
    raw_late = defaultdict(list)
    cut = "2024-01-16 00:00:00"
    for et, ts, v in ev:
        early = ts.strftime("%Y-%m-%d %H:%M:%S") < cut
        vv = v if (early or et != "click") else v + 40.0
        pools[(et, early)].append(vv)
        if not early:
            raw_late[et].append(v)

    def deciles(vals):
        s = sorted(vals)
        n = len(s)
        return [s[(n - 1) * k // 10] for k in range(1, 10)]

    for et, r in rows.items():
        de = deciles(pools[(et, True)])
        dl = deciles(pools[(et, False)])
        shift = max(abs(a - b) for a, b in zip(dl, de))
        assert r["n_early"] == len(pools[(et, True)])
        assert r["n_late"] == len(pools[(et, False)])
        assert r["max_decile_shift"] == shift, et
        assert r["drifted"] == (shift >= 25.0), et
    assert rows["click"]["drifted"], "planted click shift must flag"
    assert all(not r["drifted"] for et, r in rows.items() if et != "click")
    # translation equivariance: shifted late deciles == raw late + 40.0
    dl_shift = deciles([v + 40.0 for v in raw_late["click"]])
    assert dl_shift == [v + 40.0 for v in deciles(raw_late["click"])]
