"""Custom stateful streaming operator via applyInPandasWithState.

SURVEY.md §2 R1 / the build brief's "custom stateful operators": when the
built-in window aggregates can't express the semantics (arbitrary
per-key state machines), Spark's escape hatch is
``applyInPandasWithState`` — per-key state in the state store, Arrow
batches in/out, watermark-driven timeouts.

The operator here is a per-user activity tracker: running event count and
exact value sum (scaled-integer cents, the engine's determinism rule)
maintained across micro-batches. Each batch emits the user's updated
totals (Update mode). On a real cluster the state lives in RocksDB and
scales with distinct keys, not events.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, value_sum double"


def to_cents_half_up(values) -> "np.ndarray":
    """Scale doubles to int64 cents with HALF-UP-AWAY-FROM-ZERO ties —
    the engine-wide F.round convention. pandas/numpy ``round`` is
    half-to-even, which diverges exactly on .5-cent values and would
    make stateful-stream moments drift from their batch parity
    computation (ADVICE r5)."""
    v = np.asarray(values, dtype="float64")
    return np.copysign(np.floor(np.abs(v) * 100 + 0.5), v).astype("int64")
STATE_SCHEMA = "n long, cents long"


def track_user_activity(events: DataFrame) -> DataFrame:
    """events (streaming, with user_id/value) -> per-user running totals."""

    def track(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            n, cents = state.get
        else:
            n, cents = 0, 0
        for pdf in pdfs:
            n += len(pdf)
            cents += int(to_cents_half_up(pdf["value"]).sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_sum": [cents / 100.0],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
