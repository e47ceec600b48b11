"""Custom stateful streaming — HAB-alert hysteresis over a taxon stream.

The batch pipeline classifies bloom status per (taxon, month) after the
fact (``p2_hab_alert``; reference thresholding in
``ifcb-data-pipeline.Rmd:1010-1060``'s bloom categorization).  A
monitoring deployment wants the *online* version: raise an alert the
first micro-batch a taxon's abundance crosses the threshold, and clear
it only after ``clear_after`` consecutive quiet batches — a hysteresis
state machine that plain streaming aggregation cannot express (the
clear decision depends on run-length of quiet batches, not on any
windowed aggregate of the data itself).

Spark-first shape: ``groupBy(taxon).applyInPandasWithState`` — state is
a per-key ``(active, quiet_batches)`` tuple held by the streaming state
store (checkpointed, exactly-once with the sink), batches arrive as
Arrow-backed pandas frames.  Emits rows only on transitions, so the
output stream is tiny regardless of input rate.

The transition logic itself lives in :func:`alert_step`, a pure
function, so tests can verify the streaming run against a driver-side
replay of the same steps (and so the semantics are documented in one
place).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "taxon string, event string, ts timestamp, peak double"
STATE_SCHEMA = "active boolean, quiet int"


def alert_step(
    active: bool,
    quiet: int,
    batch_max: float,
    threshold: float,
    clear_after: int,
) -> Tuple[bool, int, str | None]:
    """One hysteresis transition: returns ``(active', quiet', event)``.

    * inactive + batch_max ≥ threshold  → active, emit ``'raised'``
    * active + quiet batch              → count it; after ``clear_after``
      consecutive quiet batches → inactive, emit ``'cleared'``
    * a loud batch while active resets the quiet counter (no event).
    """
    if batch_max >= threshold:
        if not active:
            return True, 0, "raised"
        return True, 0, None
    if active:
        quiet += 1
        if quiet >= clear_after:
            return False, 0, "cleared"
        return True, quiet, None
    return False, 0, None


def hab_alert_stream(
    stream: DataFrame,
    threshold: float,
    clear_after: int = 2,
    abund_col: str = "abund",
    ts_col: str = "ts",
    key_col: str = "taxon",
) -> DataFrame:
    """Streaming HAB-alert transitions via ``applyInPandasWithState``.

    ``stream`` is an unbounded DataFrame with at least
    ``(taxon, ts, abund)``.  Returns a stream of transition rows
    ``(taxon, event, ts, peak)`` — ``event ∈ {'raised','cleared'}``,
    ``ts``/``peak`` the max timestamp/abundance of the triggering batch.

    Scale: state is two scalars per distinct taxon (bounded dimension),
    the per-batch reduce is a pandas ``max`` over the taxon's slice, and
    only transitions are emitted.  State-store growth is O(|taxa|), not
    O(|stream|).
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch_max, batch_ts, seen = float("-inf"), None, False
        for pdf in pdfs:
            if len(pdf):
                seen = True
                m = float(pdf[abund_col].max())
                if m > batch_max:
                    batch_max = m
                t = pdf[ts_col].max()
                if batch_ts is None or t > batch_ts:
                    batch_ts = t
        if not seen:  # timeout-only invocation: nothing to do (NoTimeout)
            return
        active, quiet = state.get if state.exists else (False, 0)
        active, quiet, event = alert_step(
            active, quiet, batch_max, threshold, clear_after
        )
        state.update((active, quiet))
        if event:
            yield pd.DataFrame(
                {
                    "taxon": [key[0]],
                    "event": [event],
                    "ts": [batch_ts],
                    "peak": [batch_max],
                }
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def replay_alerts(
    ticks: list[dict],
    threshold: float,
    clear_after: int = 2,
) -> list[tuple]:
    """Driver-side reference replay of :func:`alert_step` over an ordered
    ``[{taxon, ts, abund}]`` tick list (one tick = one micro-batch's max
    for that taxon).  The streaming run must produce exactly these
    transition rows — used by the test as the oracle."""
    states: dict[str, tuple] = {}
    out = []
    for tick in ticks:
        active, quiet = states.get(tick["taxon"], (False, 0))
        active, quiet, event = alert_step(
            active, quiet, tick["abund"], threshold, clear_after
        )
        states[tick["taxon"]] = (active, quiet)
        if event:
            out.append((tick["taxon"], event, tick["ts"], tick["abund"]))
    return out
