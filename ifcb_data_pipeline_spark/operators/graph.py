"""Distributed graph operators for dedup-cluster labeling at corpus scale.

The reference resolves duplicate groups with per-file hash equality
(``merge_training_datasets/03_delete_duplicates.R:28-60``) — transitive
closure never exceeds one hash bucket there.  A fuzzy-dedup pair graph
(LSH collisions, containment pairs) *does* chain: A~B, B~C with A≁C, and
a 100 TB corpus can produce million-node near-dup chains (boilerplate
families, serial crawls).  Two closure strategies live in this package:

* ``queries.dedup._lsh_cluster_labels`` — min-label propagation, one
  join per round, converges in O(component diameter) rounds.  Right
  when components are compact (the LSH-collision common case).
* :func:`connected_components` (here) — alternating large-star /
  small-star contraction (Kiveris et al., *Connected Components in
  MapReduce and Beyond*, ACM SoCC'14).  Each round is two
  groupBy-min + join stages over the current edge set, and the edge set
  contracts to a star forest rooted at component minima in **O(log n)**
  rounds regardless of diameter — a 1M-node chain needs ~20 rounds
  here versus ~1M for propagation.  This is the 100 TB-safe default
  when component shape is unknown.

Both return the same labeling (component minimum), so they are
interchangeable and cross-checkable.  :func:`pagerank` (fixed-iteration
link analysis — the crawl-side quality signal) shares the same iterative
discipline: per-iteration key-partitioned joins with localCheckpoint-ed
O(1) lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

# Flipped (permanently, per session) the first time an Observation fails
# to deliver within the timeout — e.g. a runtime where the eager
# localCheckpoint action does not fire QueryExecutionListener metrics
# (Spark Connect).  After that every fingerprint uses the explicit-agg
# fallback: one extra job per round beats an indefinite obs.get hang
# (ADVICE r16).
_OBSERVE_UNAVAILABLE = False
_OBSERVE_TIMEOUT_S = 120.0


def _observation_get(obs: Observation, timeout_s: float = _OBSERVE_TIMEOUT_S):
    """``Observation.get`` with a timeout: get blocks forever when the
    metrics never fire, so poll it from a daemon thread and raise
    TimeoutError instead of hanging the driver.

    The blocking get runs on a bare ``threading.Thread(daemon=True)``
    rather than a ThreadPoolExecutor worker: CPython joins executor
    threads at interpreter exit (even after ``shutdown(wait=False)``),
    so a get that never returns — the exact scenario this timeout
    exists for — would otherwise hang process shutdown (ADVICE r17)."""
    import queue
    import threading

    box: queue.Queue = queue.Queue(maxsize=1)

    def _poll() -> None:
        try:
            box.put((True, obs.get))
        except BaseException as exc:  # surface get()'s own failure
            box.put((False, exc))

    threading.Thread(target=_poll, daemon=True, name="obs-get").start()
    try:
        ok, payload = box.get(timeout=timeout_s)
    except queue.Empty:
        raise TimeoutError(
            f"Observation metrics not delivered within {timeout_s}s"
        ) from None
    if not ok:
        raise payload
    return payload


def _canonical(e: DataFrame) -> DataFrame:
    """Undirected canonical form: (min, max) pairs, self-loops dropped."""
    return (
        e.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .dropDuplicates()
    )


def _neighborhoods(e: DataFrame) -> DataFrame:
    """Directed view (u, v) with every undirected edge present both ways."""
    return e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(e: DataFrame) -> DataFrame:
    """For each u: connect every strictly-larger neighbor to
    m(u) = min(Γ(u) ∪ {u}).

    One shuffle: the per-node minimum rides a window over the
    neighborhood partition instead of a groupBy + join back (which would
    cost two).  Output rows are already canonical (m < v) but NOT
    deduplicated — the caller dedups once per star pair."""
    nbr = _neighborhoods(e)
    m = F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
    return (
        nbr.withColumn("m", m)
        .where(F.col("v") > F.col("u"))
        .select(F.col("m").alias("u"), F.col("v").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For each u: connect every ≤-neighbor (and u itself) to the minimum
    of that closed ≤-neighborhood.  Same one-shuffle window form as
    :func:`_large_star`; output is canonical, not deduplicated."""
    nbr = _neighborhoods(e)
    le = nbr.where(F.col("v") <= F.col("u"))
    withm = le.withColumn("m", F.min("v").over(Window.partitionBy("u")))
    connected = withm.where(F.col("v") != F.col("m")).select(
        F.col("m").alias("u"), F.col("v").alias("v")
    )
    self_edges = withm.where(F.col("u") != F.col("m")).select(
        F.col("m").alias("u"), F.col("u").alias("v")
    )
    return connected.unionByName(self_edges)


def _local_components(e: DataFrame) -> DataFrame:
    """Single-stage contraction endgame (round 19, guide §1.2/§2.4):
    once the (checkpointed, exactly-counted) edge set fits ONE
    advisory-sized shuffle partition, further star rounds are pure
    overhead — every round still pays 4 window exchanges + 2 dedups +
    a checkpoint job over data a single task holds comfortably.
    Finish the contraction in one Arrow ``mapInPandas`` task instead:
    vectorized min-label propagation with pointer-jumping compression
    (O(log n) numpy passes, each a full-array op), which converges to
    exactly the component-minimum labeling the star contraction
    produces.  ``coalesce(1)`` is a narrow dependency — no exchange is
    added; the input blocks are already materialized by the caller's
    localCheckpoint.  Deterministic: the fixpoint labeling is unique
    (component minimum), independent of batch arrival order."""

    def finish(batches):
        import numpy as np
        import pandas as pd

        us, vs = [], []
        for b in batches:
            us.append(b["u"].to_numpy(dtype="int64"))
            vs.append(b["v"].to_numpy(dtype="int64"))
        if not us:
            return
        u = np.concatenate(us)
        v = np.concatenate(vs)
        nodes, idx = np.unique(np.concatenate([u, v]), return_inverse=True)
        iu, iv = idx[: len(u)], idx[len(u):]
        lab = np.arange(len(nodes), dtype="int64")
        while True:
            nxt = lab.copy()
            np.minimum.at(nxt, iu, lab[iv])
            np.minimum.at(nxt, iv, lab[iu])
            nxt = nxt[nxt]  # pointer jumping: halve remaining depth
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        yield pd.DataFrame({"node": nodes, "cluster": nodes[lab]})

    return e.coalesce(1).mapInPandas(finish, "node long, cluster long")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
    _round_counter: list | None = None,
    local_finish_edges: int | None = None,
) -> DataFrame:
    """Label every non-isolated node with its component's minimum node id.

    ``edges`` is an undirected edge list (direction and duplicates are
    ignored).  Returns ``(node long, cluster long)`` for every node that
    appears in ``edges``; isolated nodes are the caller's to union in
    (they are singleton components by definition).

    Scale design: each star is ONE key-partitioned window shuffle over
    the *current* edge set (window-min, not groupBy + join back), the
    edge set is deduplicated once per star pair and
    ``localCheckpoint``-ed every two pairs, and the convergence
    fingerprint rides that checkpoint job as an ``observe`` metric — so
    each two-pair round costs exactly ONE Spark job.  Convergence is
    detected by the (count, bit_xor-of-xxhash64) fingerprint and then
    *proven* with an exact two-way subtract before exiting, so a
    fingerprint collision can never return early with a wrong labeling.
    """
    def checkpoint_with_fingerprint(df: DataFrame):
        """ONE job per round: the (count, bit_xor-of-xxhash64) convergence
        fingerprint rides the localCheckpoint materialization as an
        ``observe`` metric instead of a second collect job.  bit_xor, not
        sum: ANSI mode makes a 64-bit hash sum overflow; xor is
        order-insensitive and closed over long.  The edge set is
        distinct, so xor's pair-cancellation blindness never triggers.
        If the runtime never delivers the observe metrics (ADVICE r16:
        obs.get blocks forever there), fall back — once, then
        permanently for the session — to an explicit two-column agg on
        the checkpointed frame (one extra job per round)."""
        global _OBSERVE_UNAVAILABLE
        fp_cols = (
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        )
        if not _OBSERVE_UNAVAILABLE:
            obs = Observation()
            ck = df.observe(obs, *fp_cols).localCheckpoint()  # eager job
            try:
                got = _observation_get(obs)
                return ck, (got["n"], got["h"])
            except TimeoutError:
                _OBSERVE_UNAVAILABLE = True
        else:
            ck = df.localCheckpoint()
        row = ck.agg(*fp_cols).collect()[0]
        return ck, (row["n"], row["h"])

    e, fp = checkpoint_with_fingerprint(
        _canonical(
            edges.select(
                F.col(src).cast("long").alias("u"),
                F.col(dst).cast("long").alias("v"),
            )
        )
    )

    # Scale-adaptive iteration parallelism (round 18, guide §2.2): every
    # star round is 2 window shuffles + a dedup over the CURRENT edge
    # set, whose size the convergence fingerprint just measured exactly.
    # Partitioning those exchanges by the session default (sized for the
    # whole corpus / core count) makes each of the ~log n rounds pay a
    # full session-width stage of mostly-empty tasks; deriving the count
    # from measured bytes (~48 B/edge row against the AQE advisory
    # target) sizes the rounds to the data at ANY scale — 1 partition
    # for a 5k-edge local graph, thousands for a 1e11-edge corpus graph
    # (never capped by the session default: if the derived count exceeds
    # it, the data genuinely needs more).  Restored in finally so only
    # the iteration runs resized.
    from .skew import _parse_bytes

    spark = edges.sparkSession
    try:
        advisory = _parse_bytes(spark.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"))
    except Exception:
        advisory = 64 << 20
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)

    def _iter_parts(n_edges: int) -> int:
        return max(1, -(-int(n_edges) * 48 // max(advisory, 1 << 20)))

    # Local-finish threshold (round 19): hand the endgame to ONE task as
    # soon as the measured edge count fits a single advisory-sized
    # partition — the same ~48 B/row estimate that sizes the iteration
    # exchanges, so the trigger is scale-adaptive, not a local[32]
    # constant.  At a 64 MB advisory that is ~1.4M edges (a few tens of
    # MB in Arrow), far below task memory; a 100 TB corpus graph runs
    # O(log n) star rounds until it contracts under the threshold, then
    # finishes in one stage instead of ~3 more checkpointed rounds.
    # ``local_finish_edges=0`` disables (tests force the star path).
    if local_finish_edges is None:
        local_finish_edges = max(advisory, 1 << 20) // 48
    # Two star-pair rounds per materialization: locally the cost is
    # action-count (checkpoint + fingerprint jobs), so batching halves the
    # job count at the price of at most one redundant (no-op) pair after
    # the fixpoint; on a cluster the same batching halves the number of
    # stage barriers.
    # NEGATIVE RESULT (r17, VERDICT item 4): batching THREE pairs per
    # materialization was A/B-measured on dd13's sf0.1 graph, which
    # converges in 10 star-pair rounds — convergence detection then
    # lands on the 18-pair boundary (6 checkpoints × 3) versus today's
    # 12 (6 × 2), i.e. MORE total star stages, because no-op pairs past
    # the fixpoint still pay their two window shuffles.  Three-per-round
    # only wins when round-count mod 6 cooperates; two is the stable
    # choice.
    rounds_done = 0
    converged = False
    try:
        while rounds_done < max_rounds:
            if fp[0] <= local_finish_edges:
                if _round_counter is not None:
                    _round_counter.append(rounds_done)
                return _local_components(e)
            spark.conf.set("spark.sql.shuffle.partitions", str(_iter_parts(fp[0])))
            nxt = _canonical(_small_star(_large_star(e)))
            nxt, nfp = checkpoint_with_fingerprint(
                _canonical(_small_star(_large_star(nxt)))
            )
            rounds_done += 2
            if nfp == fp:
                # fingerprints agree — prove set equality before stopping,
                # so a fingerprint collision can't end early.  Both frames
                # are exact sets (dropDuplicates) whose cardinalities the
                # fingerprints just matched, so equality ⟺ e \ nxt = ∅:
                # ONE anti-join job instead of the two-way exceptAll union
                # (round 19; halves the proof job's stages).
                if e.join(nxt, ["u", "v"], "left_anti").isEmpty():
                    if _round_counter is not None:
                        _round_counter.append(rounds_done)
                    converged = True
                    break
            e, fp = nxt, nfp
    finally:
        if prev_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )

    # Star forest: every edge is (leaf > root); roots label themselves.
    leaves = e.select(F.col("v").alias("node"), F.col("u").alias("cluster"))
    roots = e.select(F.col("u").alias("node"), F.col("u").alias("cluster"))
    return leaves.unionByName(roots).dropDuplicates()


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns ``(node long, rank double)`` for every node appearing as a
    source or destination.  Simplified model (no dangling-mass
    redistribution): r_{i+1}(v) = (1-d)/N + d·Σ_{u→v} r_i(u)/outdeg(u) —
    deterministic for a fixed iteration count, so it admits an exact
    unrolled SQL twin.

    Scale design: out-degrees are joined onto the edge list ONCE and the
    combined frame is localCheckpoint-ed — each iteration is then one
    hash join (ranks ⋈ edges on src) + one groupBy(dst) sum + a left
    join back onto the node set, all key-partitioned shuffles.  Ranks
    are checkpointed every other iteration to keep the lineage O(1).
    The rank vector is |nodes| rows — never broadcast; N rides along as
    a literal (one count job up front).
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    ).dropDuplicates()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .dropDuplicates()
        .localCheckpoint()
    )
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("odeg"))
    obs = Observation()
    e_deg = (
        e.join(deg, "src")
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    try:
        n_edges = int(_observation_get(obs)["n"])
    except TimeoutError:
        n_edges = e_deg.count()

    # Scale-adaptive iteration parallelism (round 18, guide §2.2) — the
    # same sizing rule as connected_components: every iteration's
    # shuffles move ~|edges| (contrib) / ~|nodes| (rank rebuild) rows
    # whose count is now known exactly, so size the iteration exchanges
    # to measured bytes instead of the session default.  Result-safe:
    # rank sums are summation-order "irrational-ish" doubles rounded at
    # 1e-6 on output (finite-decimal rule), and the adversarial
    # partition-count sweeps pin exactly this axis.  Restored in
    # finally; only the fixed-iteration loop runs resized.
    from .skew import _parse_bytes

    spark = edges.sparkSession
    try:
        advisory = _parse_bytes(spark.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"))
    except Exception:
        advisory = 64 << 20
    iter_parts = max(1, -(-max(n_edges, n) * 48 // max(advisory, 1 << 20)))
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(iter_parts))
        for i in range(iterations):
            contrib = (
                e_deg.join(ranks, e_deg.src == ranks.node)
                .select("dst", (F.col("rank") / F.col("odeg")).alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("in_mass"))
            )
            ranks = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
                "node",
                (F.lit(base) + damping * F.coalesce("in_mass", F.lit(0.0))).alias(
                    "rank"
                ),
            )
            if i % 2 == 1 or i == iterations - 1:
                ranks = ranks.localCheckpoint()
    finally:
        if prev_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return ranks
