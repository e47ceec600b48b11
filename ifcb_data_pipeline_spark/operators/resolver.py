"""External-enrichment resolver harness — SURVEY §2.8 C4 machinery.

The reference calls WoRMS per distinct name with 0.3 s pacing and 5
retries × 60 s backoff (``clean_taxa_fn.R:98-177``;
``ifcb-data-pipeline.Rmd:974-978``).  The Spark-side pattern is handled
by :mod:`..queries.qc_extra` (distinct → resolve → broadcast); this
module supplies the driver-side call loop itself: rate limiting,
bounded retries with backoff, and an in-run memo cache — with an
injectable sleep so tests never wait.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession


class RateLimitedResolver:
    def __init__(
        self,
        resolve_fn: Callable[[str], dict | None],
        rate_limit_s: float = 0.3,
        max_retries: int = 5,
        backoff_s: float = 60.0,
        sleep: Callable[[float], None] = time.sleep,
        clock: Callable[[], float] = time.monotonic,
    ):
        self.resolve_fn = resolve_fn
        self.rate_limit_s = rate_limit_s
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.sleep = sleep
        self.clock = clock
        self.cache: dict[str, dict | None] = {}
        self._last_call = float("-inf")

    def _pace(self) -> None:
        elapsed = self.clock() - self._last_call
        if elapsed < self.rate_limit_s:
            self.sleep(self.rate_limit_s - elapsed)
        self._last_call = self.clock()

    def resolve(self, name: str) -> dict | None:
        if name in self.cache:
            return self.cache[name]
        result: dict | None = None
        for attempt in range(self.max_retries):
            self._pace()
            try:
                result = self.resolve_fn(name)
                break
            except Exception:
                if attempt == self.max_retries - 1:
                    result = None
                else:
                    self.sleep(self.backoff_s)
        self.cache[name] = result
        return result

    def resolve_all(self, names: Iterable[str]) -> dict[str, dict | None]:
        return {n: self.resolve(n) for n in names}


def resolve_and_broadcast(
    spark: SparkSession,
    df: DataFrame,
    name_col: str,
    resolver: RateLimitedResolver,
    schema: str,
) -> DataFrame:
    """The full C4 pattern: distinct names → driver-side resolver (with
    pacing/retry/cache) → lookup DataFrame for a broadcast join.  Never
    resolves per row."""
    names = [r[0] for r in df.select(name_col).dropDuplicates().collect()]
    resolved = resolver.resolve_all(names)
    rows = [
        (n, *[(v or {}).get(field.strip().split(" ")[0]) for field in schema.split(",")[1:]])
        for n, v in resolved.items()
    ]
    return spark.createDataFrame(rows, schema)
