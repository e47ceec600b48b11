"""C4 resolver machinery: pacing, retries, caching — no real sleeping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ifcb_data_pipeline_spark.operators.resolver import (
    RateLimitedResolver,
    resolve_and_broadcast,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0
        self.sleeps: list[float] = []

    def clock(self):
        return self.t

    def sleep(self, s):
        self.sleeps.append(s)
        self.t += s


def make(resolve_fn, **kw):
    fc = FakeClock()
    r = RateLimitedResolver(
        resolve_fn, sleep=fc.sleep, clock=fc.clock, **kw
    )
    return r, fc


def test_rate_limiting_paces_calls():
    calls = []
    r, fc = make(lambda n: calls.append(n) or {"id": len(calls)})
    r.resolve("a")
    r.resolve("b")  # immediate second call must be paced by 0.3 s
    assert calls == ["a", "b"]
    assert any(s == pytest.approx(0.3, abs=1e-9) for s in fc.sleeps)


def test_retry_with_backoff_then_success():
    attempts = {"n": 0}

    def flaky(name):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("transient")
        return {"aphia_id": 42}

    r, fc = make(flaky, backoff_s=60.0)
    assert r.resolve("x") == {"aphia_id": 42}
    assert attempts["n"] == 3
    assert fc.sleeps.count(60.0) == 2  # two backoffs before success


def test_gives_up_after_max_retries_and_caches_failure():
    attempts = {"n": 0}

    def broken(name):
        attempts["n"] += 1
        raise RuntimeError("down")

    r, _ = make(broken, max_retries=5)
    assert r.resolve("x") is None
    assert attempts["n"] == 5
    r.resolve("x")  # cached — no further attempts
    assert attempts["n"] == 5


def test_cache_prevents_repeat_calls():
    calls = []
    r, _ = make(lambda n: calls.append(n) or {"id": 1})
    r.resolve("a")
    r.resolve("a")
    assert calls == ["a"]


def test_resolve_and_broadcast_pattern(spark):
    df = spark.createDataFrame(
        [("Beads",), ("Diatoms",), ("Beads",)], ["class_name"]
    )
    r, _ = make(lambda n: {"aphia_id": len(n)})
    lookup = resolve_and_broadcast(
        spark, df, "class_name", r, "class_name string, aphia_id long"
    )
    joined = df.join(F.broadcast(lookup), "class_name")
    got = {row["class_name"]: row["aphia_id"] for row in joined.collect()}
    assert got == {"Beads": 5, "Diatoms": 7}
    assert len(r.cache) == 2  # one resolver call per distinct name
