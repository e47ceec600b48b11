"""Verification for the STAGED (unregistered) round-12 candidate ops.

``queries/staged_r12.py`` is NOT imported by ``load_all`` — the driver
never sees these four ops until a future round registers them.  This file
gives them the same three verification layers a registered op gets on day
one:

1. driver-strict DuckDB oracle compare (tests/oracle_harness.compare) at
   the session SF,
2. pure-Python brute-force recomputation from the raw parquet at sf0.001
   (independent algorithms: dict-of-grams instead of the gram join, a
   hashlib HLL/CM replay, per-user nested-loop attribution),
3. structural family laws that hold regardless of data (CM one-sided
   error, HLL register monotonicity vs subset, interval-union coverage
   bounds, loss monotone in watermark delay).

Plus the staging hygiene gate: importing the staged module must not
mutate the driver-visible REGISTRY.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest

from ifcb_data_pipeline_spark.queries import REGISTRY, load_all
from ifcb_data_pipeline_spark.queries.staged_r12 import STAGED
from tests.oracle_harness import compare

SF_SMOKE = "/root/testdata/sf0.001"

load_all()


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _dround(x: float, d: int) -> float:
    f = float(10.0**d)
    return math.floor(x * f + 0.5) / f


# --- staging hygiene --------------------------------------------------------


def test_pool_registered_and_pointers_live():
    # round 11 registered this pool: every staged name must now be a
    # driver-visible REGISTRY entry, and the STAGED pointer must be the
    # very same fn/oracle the driver sees (not a stale copy)
    assert set(STAGED) == {
        "dd20_exact_substring_dedup",
        "a28_hll_distinct_sketch",
        "a29_cms_heavy_hitters",
        "st9_join_state_audit",
    }
    assert set(STAGED) <= set(REGISTRY)
    for name, sdef in STAGED.items():
        assert sdef.fn is REGISTRY[name].fn
        assert sdef.oracle == REGISTRY[name].oracle
    assert len(REGISTRY) == 216


# --- layer 1: driver-strict oracle compare ---------------------------------


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_matches_oracle(name, spark, duck, sf_dir):
    qdef = STAGED[name]
    ok, msg = compare(qdef.fn(spark, sf_dir), duck, qdef.oracle)
    assert ok, f"{name}: {msg}"


# --- layer 2+3: dd20 exact substring dedup ----------------------------------


def test_dd20_bruteforce_gram_replay(spark):
    got = (
        STAGED["dd20_exact_substring_dedup"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    k = 40
    by_gram: dict[str, set[int]] = {}
    positions: dict[int, list[int]] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        if len(text) < k:
            continue
        for i in range(len(text) - k + 1):
            by_gram.setdefault(text[i : i + k], set()).add(int(doc_id))
    dup_grams = {g for g, ds in by_gram.items() if len(ds) >= 2}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        ps = [
            i
            for i in range(max(0, len(text) - k + 1))
            if text[i : i + k] in dup_grams
        ]
        if ps:
            positions[int(doc_id)] = ps

    assert set(got.index) == set(positions)
    for doc_id, ps in positions.items():
        text_len = int(docs.loc[docs["doc_id"] == doc_id, "n_chars"].iloc[0])
        # exact union-of-intervals coverage, independently via a char set
        covered = set()
        for p in ps:
            covered.update(range(p, p + k))
        row = got.loc[doc_id]
        assert row["n_dup_positions"] == len(ps)
        assert row["first_pos"] == min(ps)
        assert row["n_dup_chars"] == len(covered)
        assert row["dup_frac"] == _dround(len(covered) / text_len, 6)
        assert bool(row["flag_dup"]) == (len(covered) * 5 >= text_len)
        # structural bounds: k <= coverage <= min(len, n_positions * k)
        assert k <= row["n_dup_chars"] <= min(text_len, len(ps) * k)


# --- layer 2+3: a28 HLL sketch ----------------------------------------------


def _hll_replay(keys) -> tuple[float, int]:
    m, regs = 64, [0] * 64
    for key in keys:
        h = _h32(f"c{key}")
        b, w = h % m, h // m
        rho = 27 if w == 0 else 27 - w.bit_length()
        regs[b] = max(regs[b], rho)
    used = sum(1 for r in regs if r > 0)
    z = sum(2.0 ** -r for r in regs)
    e_raw = 0.709 * m * m / z
    v = m - used
    if e_raw <= 2.5 * m and v > 0:
        return m * math.log(m / v), used
    return e_raw, used


def test_a28_hashlib_hll_replay(spark):
    got = STAGED["a28_hll_distinct_sketch"].fn(spark, SF_SMOKE).toPandas()
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    months = orders["o_orderdate"].astype("datetime64[ns]").dt.strftime("%Y-%m")
    for month, grp in orders.groupby(months):
        est, used = _hll_replay(grp["o_custkey"])
        exact = grp["o_custkey"].nunique()
        row = got.loc[got["month"] == month].iloc[0]
        assert row["exact_distinct"] == exact
        assert row["n_buckets_used"] == used
        est_u = math.floor(est * 10000.0 + 0.5)  # the op's 1e-4 quantization
        assert row["hll_estimate"] == est_u / 10000.0
        assert row["rel_err_pct"] == _dround(
            (est_u - 10000 * exact) / (100.0 * exact), 4
        )
        # HLL family laws: estimate positive; used <= min(m, exact) —
        # registers only fill from actual keys
        assert row["hll_estimate"] > 0
        assert row["n_buckets_used"] <= min(64, exact)
    assert len(got) == months.nunique()


def test_a28_register_monotone_under_subset():
    # structural law, data-free: adding keys can only grow registers,
    # so `used` is monotone and the raw-branch estimate is monotone in
    # the registers
    keys = [f"k{i}" for i in range(200)]
    _, used_half = _hll_replay(keys[:100])
    _, used_full = _hll_replay(keys)
    assert used_half <= used_full


def test_a28_linear_counting_ln_parity_exhaustive(spark, duck):
    """a28's small-range correction is `64 * ln(64 / v)` with v in 1..63
    — a FINITE transcendental input domain, so the JVM-vs-libm one-ulp
    hazard (the documented Math.pow(10,-5) divergence class, SCALE.md)
    is checkable exhaustively rather than probabilistically.  The check
    FOUND real divergence: JVM Math.log is 1 ulp off libm (= CPython =
    DuckDB) at v in {21, 23, 26, 35, 40, 52} — which is why a28
    quantizes the estimate to integer 1e-4 units (e_u) before both
    output columns.  This test certifies the full safety argument for
    every possible input: (a) the three engines agree within 1 ulp,
    (b) floor(e*1e4+0.5) is stable under ±2 ulp around EACH engine's
    value, and (c) the resulting e_u is identical across engines — so
    a28's outputs are bit-deterministic for any data whatsoever."""
    import math
    import struct

    def bits(x: float) -> int:
        return struct.unpack("<q", struct.pack("<d", x))[0]

    def of_bits(b: int) -> float:
        return struct.unpack("<d", struct.pack("<q", b))[0]

    rows = spark.range(1, 64).selectExpr(
        "id AS v", "64.0 * ln(64.0 / cast(id AS double)) AS e"
    ).collect()
    sp = {r["v"]: r["e"] for r in rows}
    du = dict(
        duck.execute(
            "SELECT v, 64.0 * ln(64.0 / v::DOUBLE) FROM"
            " (SELECT unnest(range(1, 64)) AS v)"
        ).fetchall()
    )
    known_divergent = {21, 23, 26, 35, 40, 52}
    for v in range(1, 64):
        py = 64.0 * math.log(64.0 / v)
        vals = (sp[v], py, du[v])
        spread = max(bits(x) for x in vals) - min(bits(x) for x in vals)
        assert spread <= 1, (v, vals)
        if spread:
            assert v in known_divergent, f"NEW divergent input v={v}: {vals}"
        e_us = set()
        for x in vals:
            base = math.floor(x * 10000.0 + 0.5)
            e_us.add(base)
            for ulps in (-2, -1, 1, 2):
                nudged = math.floor(of_bits(bits(x) + ulps) * 10000.0 + 0.5)
                assert nudged == base, (v, x, ulps)
        assert len(e_us) == 1, (v, e_us)


# --- layer 2+3: a29 count-min sketch ----------------------------------------


def test_a29_hashlib_cms_replay_and_one_sided_law(spark):
    got = STAGED["a29_cms_heavy_hitters"].fn(spark, SF_SMOKE).toPandas()
    events = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    n = len(events)
    counters: dict[tuple[int, int], int] = {}
    for uid in events["user_id"]:
        for r in range(3):
            b = _h32(f"r{r}|{uid}") % 256
            counters[(r, b)] = counters.get((r, b), 0) + 1
    exact = events.groupby("user_id").size()
    assert set(got["user_id"]) == set(exact.index)
    for _, row in got.iterrows():
        uid = row["user_id"]
        est = min(counters[(r, _h32(f"r{r}|{uid}") % 256)] for r in range(3))
        assert row["n_exact"] == exact[uid]
        assert row["n_est"] == est
        assert row["overestimate"] == est - exact[uid]
        # CM's defining one-sided guarantee
        assert row["n_est"] >= row["n_exact"]
        assert bool(row["is_heavy_hitter"]) == (est * 100 >= n)
    # conservation: each CM row's counters sum to exactly N
    for r in range(3):
        assert sum(v for (rr, _), v in counters.items() if rr == r) == n


# --- layer 2+3: st9 join state audit ----------------------------------------


def test_st9_nested_loop_replay_and_monotone_loss(spark):
    got = (
        STAGED["st9_join_state_audit"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("delay_s")
        .sort_index()
    )
    events = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev = events[["user_id", "event_type", "ts"]].copy()
    ev["us"] = ev["ts"].astype("datetime64[ns]").astype("int64") // 1000
    gaps = []
    for _, grp in ev.groupby("user_id"):
        clicks = grp.loc[grp["event_type"] == "click", "us"]
        views = grp.loc[grp["event_type"] == "view", "us"]
        for c in clicks:
            for v in views:
                if v <= c < v + 600_000_000:
                    gaps.append(c - v)
    for d in (60, 180, 600):
        lost = sum(1 for g in gaps if g > d * 1_000_000)
        row = got.loc[d]
        assert row["n_pairs"] == len(gaps)
        assert row["n_retained"] == len(gaps) - lost
        assert row["n_lost"] == lost
        assert row["loss_frac"] == _dround(lost / len(gaps), 6)
        assert row["max_gap_s"] == max(gaps) // 1_000_000
        assert row["mean_gap_s"] == _dround(sum(gaps) / len(gaps) / 1e6, 4)
    # retention is monotone in the delay, and the 600s delay (= the join
    # window) loses nothing by construction
    assert got["n_lost"].tolist() == sorted(got["n_lost"].tolist(), reverse=True)
    assert got.loc[600, "n_lost"] == 0
