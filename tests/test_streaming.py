"""Incremental/streaming semantics: exactly-once per key, idempotent
re-runs (SURVEY §2.10 I1-I4)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from ifcb_data_pipeline_spark.streaming.incremental import (
    CheckpointedJob,
    new_work,
    run_incremental_batch,
)


def test_new_work_anti_join(spark):
    cand = spark.createDataFrame([("a",), ("b",), ("c",)], ["key"])
    ledger = spark.createDataFrame([("b",)], ["key"])
    got = sorted(r["key"] for r in new_work(cand, ledger, "key").collect())
    assert got == ["a", "c"]


def test_incremental_batch_idempotent(spark):
    with tempfile.TemporaryDirectory() as tmp:
        ckpt, out = f"{tmp}/ckpt", f"{tmp}/out"
        cand = spark.createDataFrame([(str(i),) for i in range(10)], ["key"])
        transform = lambda df: df.withColumn("processed", F.lit(True))

        n1 = run_incremental_batch(spark, cand, "key", transform, ckpt, out)
        assert n1 == 10
        # Re-run: nothing new to do.
        n2 = run_incremental_batch(spark, cand, "key", transform, ckpt, out)
        assert n2 == 0
        # New keys arrive: only they get processed.
        cand2 = spark.createDataFrame([(str(i),) for i in range(12)], ["key"])
        n3 = run_incremental_batch(spark, cand2, "key", transform, ckpt, out)
        assert n3 == 2
        assert spark.read.parquet(out).count() == 12
        # Output keys unique — exactly-once per key.
        assert spark.read.parquet(out).select("key").distinct().count() == 12


def test_checkpointed_job_empty_ledger(spark):
    with tempfile.TemporaryDirectory() as tmp:
        job = CheckpointedJob(spark, tmp, "key")
        cand = spark.createDataFrame([("x",)], ["key"])
        assert job.pending(cand).count() == 1


def test_undelivered_recent_short_circuit(spark):
    """I5: empty result when the newest-k bins are all delivered."""
    from ifcb_data_pipeline_spark.streaming.incremental import undelivered_recent

    bins = spark.createDataFrame(
        [(f"D2024010{d}T000000_IFCB1",) for d in range(1, 8)], "sample string"
    )
    all_delivered = bins
    assert undelivered_recent(bins, all_delivered, newest_k=3).count() == 0
    # Only the newest-k window is considered: with k=3 an undelivered
    # OLD bin does not block the short-circuit…
    partial = bins.where(F.col("sample") > "D20240101")
    assert undelivered_recent(bins, partial, newest_k=3).count() == 0
    # …but an undelivered NEW bin does.
    missing_newest = bins.where(F.col("sample") < "D20240107")
    out = undelivered_recent(bins, missing_newest, newest_k=3).collect()
    assert [r.sample for r in out] == ["D20240107T000000_IFCB1"]


def test_suppress_duplicate_comments(spark):
    """I6: candidate comments already present remotely are dropped."""
    from ifcb_data_pipeline_spark.streaming.incremental import (
        suppress_duplicate_comments,
    )

    cand = spark.createDataFrame(
        [("b1", "bad gps"), ("b1", "bubbles"), ("b2", "bad gps")],
        "sample string, comment string",
    )
    existing = spark.createDataFrame(
        [("b1", "bad gps")], "sample string, comment string"
    )
    out = suppress_duplicate_comments(cand, existing).orderBy("sample", "comment")
    assert [(r.sample, r.comment) for r in out.collect()] == [
        ("b1", "bubbles"), ("b2", "bad gps"),
    ]
    # idempotent: re-suppressing after merge leaves nothing new
    merged = existing.unionByName(out)
    assert suppress_duplicate_comments(cand, merged).count() == 0


def test_hab_alert_hysteresis_stream(spark):
    """Stateful streaming (applyInPandasWithState): alert raises on the
    first loud batch and clears only after `clear_after` consecutive
    quiet batches; the streaming output must equal a driver-side replay
    of the same transition function."""
    import os
    import tempfile

    from ifcb_data_pipeline_spark.streaming.stateful import (
        hab_alert_stream,
        replay_alerts,
    )

    ticks = [  # one micro-batch each, single taxon
        {"taxon": "Dinophysis", "ts": "2024-01-01 00:00:00", "abund": 5.0},
        {"taxon": "Dinophysis", "ts": "2024-01-02 00:00:00", "abund": 20.0},
        {"taxon": "Dinophysis", "ts": "2024-01-03 00:00:00", "abund": 3.0},
        {"taxon": "Dinophysis", "ts": "2024-01-04 00:00:00", "abund": 25.0},
        {"taxon": "Dinophysis", "ts": "2024-01-05 00:00:00", "abund": 2.0},
        {"taxon": "Dinophysis", "ts": "2024-01-06 00:00:00", "abund": 1.0},
    ]
    expected = replay_alerts(ticks, threshold=10.0, clear_after=2)
    assert [(e[0], e[1]) for e in expected] == [
        ("Dinophysis", "raised"),
        ("Dinophysis", "cleared"),
    ]

    with tempfile.TemporaryDirectory() as tmp:
        src, ckpt = f"{tmp}/src", f"{tmp}/ckpt"
        os.makedirs(src)
        stream = spark.readStream.schema(
            "taxon string, ts timestamp, abund double"
        ).csv(src)
        q = (
            hab_alert_stream(stream, threshold=10.0, clear_after=2)
            .writeStream.format("memory")
            .queryName("hab_alerts")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            for i, t in enumerate(ticks):
                with open(f"{src}/tick{i}.csv", "w") as f:
                    f.write(f"{t['taxon']},{t['ts']},{t['abund']}\n")
                q.processAllAvailable()
            got = [
                (r["taxon"], r["event"], str(r["ts"]), r["peak"])
                for r in spark.sql(
                    "SELECT * FROM hab_alerts ORDER BY ts"
                ).collect()
            ]
        finally:
            q.stop()
    assert got == [(t, e, ts, p) for t, e, ts, p in expected]


def test_drain_helper_returns_false_on_streaming_failure(spark, sf_dir):
    """ADVICE r4: a streaming failure (not just a timeout) must leave the
    batch fallback reachable.  An append-mode aggregate WITHOUT a
    watermark is rejected by the engine at start() — the helper must
    swallow that and return False instead of raising."""
    from pyspark.sql import functions as F

    from ifcb_data_pipeline_spark.queries.multimodal import _drain_to_memory

    stream = (
        spark.readStream.format("parquet")
        .schema(
            "event_id bigint, ts timestamp, user_id bigint, event_type string,"
            " value double, props string"
        )
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    # no withWatermark → append mode on an aggregate is an AnalysisException
    bad = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ok = _drain_to_memory(
        bad.writeStream.format("memory").outputMode("append"),
        "drain_helper_failure_probe",
    )
    assert ok is False


def test_st8_streaming_path_drains(spark, sf_dir):
    """The session-window stream must actually drain (availableNow) —
    st8's correctness row must pin the STREAMING path, not the batch
    twin.  After the run the memory sink holds exactly the finalized
    sessions: every emitted session_end <= max(ts) - 40 min."""
    from pyspark.sql import functions as F

    from ifcb_data_pipeline_spark.queries.multimodal import (
        st8_streaming_sessions,
    )

    out = st8_streaming_sessions(spark, sf_dir)
    # the streaming drain registers a memory table; batch fallback doesn't
    assert any(t.name == "st8_sessions" for t in spark.catalog.listTables()), (
        "st8 fell back to the batch twin on a healthy stream"
    )
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    mx = events.agg(F.max("ts")).collect()[0][0]
    rows = out.collect()
    assert rows, "no finalized sessions at sf0.01"
    import datetime as dt

    cutoff = mx - dt.timedelta(minutes=40)
    assert all(r["session_end"] <= cutoff for r in rows)
    # sessions are per-user disjoint: starts strictly ordered per user
    seen = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["session_start"])):
        prev = seen.get(r["user_id"])
        if prev is not None:
            assert r["session_start"] >= prev, "overlapping sessions"
        seen[r["user_id"]] = r["session_end"]


def test_st8_invariant_to_microbatch_slicing(spark, sf_dir, tmp_path):
    """Sessions must merge correctly in state ACROSS micro-batch
    boundaries: slicing the input into 4 arrival-ordered files processed
    one per trigger (progressing watermark) must emit exactly the same
    finalized-session set as the single-batch drain.  (Arrival order is
    event time order in this data — i11 measures zero lateness — so no
    event is dropped and the final watermark is identical.)"""
    import pyspark.sql.functions as F

    from ifcb_data_pipeline_spark.queries.multimodal import (
        st8_streaming_sessions,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    n = events.count()
    src = str(tmp_path / "sliced")
    # 4 arrival-ordered slices, one parquet file each, lexicographic
    # file order = arrival order
    bounds = [0, n // 4, n // 2, 3 * n // 4, n]
    ordered = events.orderBy("event_id").collect()
    for i in range(4):
        chunk = ordered[bounds[i] : bounds[i + 1]]
        spark.createDataFrame(chunk, events.schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.format("parquet")
        .schema(
            "event_id bigint, ts timestamp, user_id bigint, event_type string,"
            " value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    sessions = (
        stream.withWatermark("ts", "40 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
    q = (
        sessions.writeStream.format("memory")
        .outputMode("append")
        .queryName("st8_sliced")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "sliced stream did not drain"
    q.stop()

    sliced = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("st8_sliced").collect()
    }
    single = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in st8_streaming_sessions(spark, sf_dir).collect()
    }
    assert sliced == single, (
        f"micro-batch slicing changed the session set: "
        f"only-sliced={len(sliced - single)} only-single={len(single - sliced)}"
    )


def test_watermark_drops_planted_too_late_event(spark, tmp_path):
    """The shipped event streams are fully in-order (i11 measures zero
    lateness at every SF), so no natural-data test ever exercises the
    watermark's DISCARD path — the 'watermark-bounded state' claim
    needs a plant.  Three micro-batches: batch 0 fills the 10:00
    window, batch 1 advances past it (watermark 10:50 emits + evicts
    its state), batch 2 replays an event into the evicted window — the
    replay must be dropped (Spark only filters late rows once the
    window's state is gone; a replay in the SAME batch as the eviction
    would still merge, which is why the plant needs the middle batch).
    The batch twin (no watermark) counts the replay — proving the
    plant is non-vacuous."""
    import pandas as pd
    import pyspark.sql.functions as F

    src = tmp_path / "late_stream"
    src.mkdir()

    def write(name, rows):
        df = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        # µs precision: Spark's parquet reader rejects TIMESTAMP(NANOS)
        df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
        df.to_parquet(src / name)

    import time

    # batch 0: two rows in the 10:00 window + an advancer that sets the
    # next batch's watermark to 10:50 (= 11:00 − 10 min)
    write(
        "0001.parquet",
        [
            (1, "2024-01-10 10:00:30", 1, "click", 1.0, "{}"),
            (2, "2024-01-10 10:01:30", 1, "click", 1.0, "{}"),
            (3, "2024-01-10 11:00:00", 2, "click", 1.0, "{}"),
        ],
    )
    time.sleep(1.1)  # distinct mtimes: the file source triggers oldest-first
    # batch 1: runs at watermark 10:50 → emits the 10:00 window (n=2)
    # and evicts its state; this row itself lands in the live 10:55 window
    write("0002.parquet", [(5, "2024-01-10 10:56:00", 1, "click", 1.0, "{}")])
    time.sleep(1.1)
    # batch 2: the replay targets the evicted window → dropped; the
    # advancer finalizes everything up to 11:20
    write(
        "0003.parquet",
        [
            (4, "2024-01-10 10:02:30", 1, "click", 1.0, "{}"),
            (6, "2024-01-10 11:30:00", 2, "click", 1.0, "{}"),
        ],
    )

    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string"
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .outputMode("append")
        .queryName("late_drop_probe")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
        dropped = sum(
            (p["stateOperators"][0].get("numRowsDroppedByWatermark") or 0)
            for p in q.recentProgress
            if p["stateOperators"]
        )
    finally:
        q.stop()
    got = {
        r["ws"].strftime("%H:%M"): r["n"]
        for r in spark.sql("SELECT * FROM late_drop_probe").collect()
    }
    # finalized output: the 10:00 window EXCLUDES the too-late replay,
    # the in-time 10:55/11:00 rows count, the 11:30 window never
    # finalizes (final watermark 11:20 < its end)
    assert got == {"10:00": 2, "10:55": 1, "11:00": 1}, got
    assert dropped == 1  # exactly the replay, via the state metric

    # batch twin without a watermark counts the replay — the plant bites
    batch = (
        spark.read.parquet(str(src))
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("w.start") == "2024-01-10 10:00:00")
        .collect()
    )
    assert batch[0]["n"] == 3
