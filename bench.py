"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE final JSON line in the driver-contract shape (scalar
median seconds per query; a query whose max/min spread exceeds 3x gets
ONE extra pass and reports best-of-4 — see the spread-retry note):
  {"metric": "...", "value": N, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": ...}
plus two diagnostic lines above it: `headline_query_spread` (the
per-query [median, min, max] triples) and `machine_probe`.

Each query is forced end-to-end with a noop sink (full computation, no
write cost).  The headline set spans the operator families: composed
pipeline, rollup aggregation, enrichment join chain, as-of join, window
QC, MinHash dedup, ANN top-k, text scoring.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ifcb_data_pipeline_spark.queries import load_all  # noqa: E402
from ifcb_data_pipeline_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "p1_shark_export",
    "p2_hab_alert",
    "a1_biovolume_rollup",
    "a4_monthly_stats",
    "j1_enrichment_chain",
    "j4_asof_join",
    "j5_interval_join",
    "w1_adjacency_removal",
    "dd2_minhash_lsh",
    "sim1_cosine_topk",
    "tx2_quality_score",
    "p3_dashboard_metadata",
    "tp1_training_corpus",
    "pk1_sequence_packing",
    "sim8_kmeans_refine",
    "tp2_multimodal_corpus",
    "pk2_document_chunking",
    "j14_bucketed_range_join",
    "sim9_quantized_rerank",
    "tp3_incremental_refresh",
    "sim10_pq_adc",
    "dp8_exact_quantiles",
    "o8_zorder_layout",
    "dd11_span_dedup",
    "mm9_perceptual_dedup",
    "tp4_curriculum_order",
    "tp5_funnel_report",
    "dd13_star_components",
    "tx13_bm25_topk",
    "j17_point_in_time_join",
    "sp8_importance_resampling",
]


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def machine_probe() -> dict:
    """Code-independent run-condition probe (~1 s): a fixed single-thread
    Python spin and a fixed 8-thread sha256 burst.  Emitted into the
    bench tail so a reader can divide machine drift out of the headline
    before reading a delta as a regression — round-10/11 forensics
    showed this box's single-thread rate alone swings ~1.4x and its
    parallel throughput up to 20x between co-tenancy windows
    (MACHINE_BASELINE.jsonl; tools/machine_baseline.py has the long
    form).  Spin is pinned BEFORE the suite so both numbers describe
    the same window the measurements ran in."""
    import hashlib
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.perf_counter()
    x = 0
    for i in range(2_000_000):
        x += i * 3 // 2
    spin = time.perf_counter() - t0
    blob = b"x" * 1_000_000

    def work(_):
        for _ in range(100):
            hashlib.sha256(blob).digest()

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(work, range(8)))
    sha = time.perf_counter() - t0
    assert x > 0
    return {"spin_s": round(spin, 3), "sha8_s": round(sha, 3)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    registry = load_all()
    spark = get_spark("ifcb-bench")
    probe_before = machine_probe()

    # Warm pass: run the whole headline set once unmeasured so the timed
    # pass measures the steady-state plan (codegen compiled, parquet
    # footers read, Python workers forked), not session startup.  On a
    # long-lived cluster these costs amortize to zero; folding them into
    # per-query numbers would make the first query look 2-3x worse than
    # its actual plan.
    for name in HEADLINE:
        run_query(registry[name].fn(spark, sf_dir))

    # Median of 3 measured passes per query: single-pass wall times at
    # this data scale swing ±30% on unchanged code (driver r4 showed p2
    # −30% and p3 +31% simultaneously with neither touched), which buries
    # real regressions.  The median damps one bad scheduling draw; the
    # min/max spread is emitted so a reader can see whether a delta
    # exceeds the noise floor.  Passes are interleaved (3 sweeps over the
    # whole set, not 3 back-to-back runs of one query) so a transient
    # system stall hits at most one sample per query.
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(3):
        for name in HEADLINE:
            t0 = time.perf_counter()
            run_query(registry[name].fn(spark, sf_dir))
            samples[name].append(time.perf_counter() - t0)

    # Spread-retry (VERDICT r17 item 8, measurement hygiene): a query
    # whose max/min exceeds 3x on unchanged code was hit by a transient
    # co-tenancy stall (a correct plan does not vary 3.5x by code —
    # BENCH_r17 showed p1 [5.90, 2.64, 9.19]).  Give each such query ONE
    # extra pass and keep the best-of-4 median, so a single bad draw
    # cannot dominate the recorded triple.
    for name in HEADLINE:
        s = samples[name]
        if min(s) > 0 and max(s) / min(s) > 3.0:
            t0 = time.perf_counter()
            run_query(registry[name].fn(spark, sf_dir))
            s.append(time.perf_counter() - t0)

    # MEASUREMENT-HANDSHAKE FIX (VERDICT r18 item 2, a measurement bug
    # per the round rules — stated explicitly in OPTIMIZATION_r19.md):
    # rounds 1-16 emitted scalar per-query seconds and the driver's
    # comparator produced per-query tables; round 17 switched the
    # `queries` values to [median, min, max] triples and the comparator
    # has parsed NOTHING since (PERF_r18: prev/now_bench_ok false,
    # n_common 0, geomean null, for two rounds of BENCH files that both
    # parse as JSON).  The final line therefore goes back to the
    # documented contract shape — {"name": median_sec} scalars — and the
    # triples move to their own `headline_query_spread` line ABOVE it,
    # so no information is dropped (spread data still printed and kept
    # in any full-stdout capture) and no entry is removed or renamed.
    # Budget: the driver keeps a ~2000-char stdout tail and parses the
    # FINAL line; scalar headline (~1.0 kB worst case, pinned in
    # tests/test_registry_budget.py) + probe (~160 B) always fit; the
    # spread line is the one that truncates first, by design.
    medians = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    spreads = {
        n: [round(statistics.median(s), 3), round(min(s), 2), round(max(s), 2)]
        for n, s in samples.items()
    }
    total = round(sum(medians.values()), 3)
    probe_after = machine_probe()
    print(json.dumps({"metric": "headline_query_spread", "queries": spreads}))
    # One compact (<160 B) run-conditions line ABOVE the headline: small
    # enough that the driver's bounded stdout tail keeps both lines, and
    # the headline stays the final line for the parser.  before/after
    # bracket the suite — co-tenancy windows shift within minutes here.
    print(
        json.dumps(
            {"metric": "machine_probe", "before": probe_before, "after": probe_after}
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_time",
                "value": total,
                "unit": "sec",
                "queries": medians,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
