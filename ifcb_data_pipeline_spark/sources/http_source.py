"""Driver-side HTTP sources — SURVEY §2.1 S9 (dashboard REST) / S12
(SHARK web data).

The reference fetches small CSV/JSON payloads over HTTP on the driver
(``code/helpers.R:21-107`` builds dashboard metadata URLs with retries;
``compare_microscopy.R:35-41`` downloads SHARK microscopy data) and
treats the result as an in-memory table.  The Spark shape is the same:
fetch ON THE DRIVER with bounded retry/backoff, parse into pandas, then
``spark.createDataFrame`` — these payloads are metadata-sized (10²-10⁵
rows), never fact-scale, so a distributed read would be pure overhead.

``transport`` is injectable (url → bytes) so the source is hermetically
testable; the default uses stdlib urllib.  Backoff sleeps are
injectable for the same reason.
"""

from __future__ import annotations

import io
import json
import time
from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession


def _default_transport(url: str, timeout: float = 30.0) -> bytes:
    from urllib.request import urlopen

    with urlopen(url, timeout=timeout) as resp:  # noqa: S310 (driver-side fetch)
        return resp.read()


def fetch_with_retry(
    url: str,
    transport: Callable[[str], bytes] | None = None,
    max_retries: int = 5,
    backoff_seconds: float = 1.0,
    sleep: Callable[[float], None] = time.sleep,
) -> bytes:
    """Fetch ``url`` with exponential backoff — the reference's retry
    loop (``max_retries=5, sleep_time=60`` in clean_taxa_fn.R:108-135;
    helpers.R wraps the dashboard API the same way)."""
    transport = transport or _default_transport
    last_err: Exception | None = None
    for attempt in range(max_retries):
        try:
            return transport(url)
        except Exception as err:  # noqa: BLE001 — any transport failure retries
            last_err = err
            if attempt < max_retries - 1:
                sleep(backoff_seconds * (2**attempt))
    raise ConnectionError(
        f"fetch failed after {max_retries} attempts: {url}"
    ) from last_err


def http_csv_source(
    spark: SparkSession,
    url: str,
    transport: Callable[[str], bytes] | None = None,
    sep: str = ",",
    **retry_kwargs,
) -> DataFrame:
    """S12-style web CSV/TSV → DataFrame (driver-side fetch + parse)."""
    raw = fetch_with_retry(url, transport=transport, **retry_kwargs)
    pdf = pd.read_csv(io.BytesIO(raw), sep=sep)
    return spark.createDataFrame(pdf)


def http_json_source(
    spark: SparkSession,
    url: str,
    transport: Callable[[str], bytes] | None = None,
    record_path: str | None = None,
    **retry_kwargs,
) -> DataFrame:
    """S9-style REST JSON → DataFrame.  ``record_path`` selects a list
    field of the response object (e.g. the dashboard's bin list)."""
    raw = fetch_with_retry(url, transport=transport, **retry_kwargs)
    obj = json.loads(raw)
    if record_path is not None:
        obj = obj[record_path]
    return spark.createDataFrame(pd.DataFrame(obj))
