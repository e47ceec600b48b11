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
interchangeable and cross-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    m(u) = min(Γ(u) ∪ {u})."""
    nbr = _neighborhoods(e)
    mins = nbr.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", F.col("u")).alias("m"))
    return _canonical(
        nbr.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For each u: connect every ≤-neighbor (and u itself) to the minimum
    of that closed ≤-neighborhood."""
    nbr = _neighborhoods(e)
    le = nbr.where(F.col("v") <= F.col("u"))
    mins = le.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", F.col("u")).alias("m"))
    connected = le.join(mins, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_edges = mins.select(F.col("u"), F.col("m").alias("v"))
    return _canonical(connected.unionByName(self_edges))


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
    _round_counter: list | None = None,
) -> DataFrame:
    """Label every non-isolated node with its component's minimum node id.

    ``edges`` is an undirected edge list (direction and duplicates are
    ignored).  Returns ``(node long, cluster long)`` for every node that
    appears in ``edges``; isolated nodes are the caller's to union in
    (they are singleton components by definition).

    Scale design: every round is whole-stage-codegen DataFrame ops — two
    groupBy(min) + two joins — over the *current* edge set, which only
    ever shrinks toward one star edge per non-root node.  The edge set is
    ``localCheckpoint``-ed each round so the iterative plan's lineage
    stays O(1) instead of O(rounds).  Convergence is detected by a
    (count, xxhash64-sum) fingerprint and then *proven* with an exact
    two-way subtract before exiting, so a fingerprint collision can never
    return early with a wrong labeling.
    """
    e = _canonical(
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
    ).localCheckpoint()

    def fingerprint(df: DataFrame):
        # bit_xor, not sum: ANSI mode makes a 64-bit hash sum overflow;
        # xor is order-insensitive and closed over long.  The edge set is
        # distinct, so xor's pair-cancellation blindness never triggers.
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    fp = fingerprint(e)
    for round_no in range(max_rounds):
        nxt = _small_star(_large_star(e)).localCheckpoint()
        nfp = fingerprint(nxt)
        if nfp == fp:
            # fingerprints agree — prove set equality before stopping
            if (
                nxt.exceptAll(e).isEmpty()
                and e.exceptAll(nxt).isEmpty()
            ):
                if _round_counter is not None:
                    _round_counter.append(round_no + 1)
                break
        e, fp = nxt, nfp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )

    # Star forest: every edge is (leaf > root); roots label themselves.
    leaves = e.select(F.col("v").alias("node"), F.col("u").alias("cluster"))
    roots = e.select(F.col("u").alias("node"), F.col("u").alias("cluster"))
    return leaves.unionByName(roots).dropDuplicates()
