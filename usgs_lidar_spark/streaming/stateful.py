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


FUNNEL_OUTPUT_SCHEMA = "user_id long, stage long"
#: state: highest funnel stage reached (0 none, 1 view, 2 click,
#: 3 purchase) + the microsecond timestamp at which it was reached.
FUNNEL_STATE_SCHEMA = "stage long, ts_us long"

#: The ordered funnel steps (must match the batch oracle's
#: events_funnel_ordered stages).
FUNNEL_STEPS = ("view", "click", "purchase")


def track_funnel_stage(events: DataFrame) -> DataFrame:
    """Per-user ordered-funnel state machine — the STREAMING twin of the
    batch `events_funnel_ordered` query, as an `applyInPandasWithState`
    per-key state machine (the case built-in window aggregates cannot
    express: the stage-k timestamp depends on the stage-(k-1) choice).

    State per user is two longs: the highest stage reached and the
    timestamp at which it was reached. A batch's events sort by
    timestamp inside the group and fold through the same transition
    rule as the batch query: an event advances the funnel iff it is
    the NEXT step and STRICTLY later than the current stage's
    timestamp. Each batch emits the user's current stage (Update
    mode). Equivalence with the batch three-join form holds because
    the batch form also picks min-timestamps stage by stage — both
    compute the same greedy earliest chain. The transition rule is
    tie-order-independent within a batch (after an advance, ts_us
    equals the tying timestamp, so no same-timestamp event can chain),
    but ACROSS batches the fold consumes arrival order: an event
    arriving in a later micro-batch with an earlier timestamp than an
    already-consumed transition is not replayed (the standard
    streaming state-machine contract — feed it time-ordered batches,
    or accept at-arrival semantics).

    At scale: state is O(distinct users) x 16 bytes in RocksDB;
    events stream through once.
    """

    def track(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            stage, ts_us = state.get
        else:
            stage, ts_us = 0, -(2**62)
        for pdf in pdfs:
            for _, r in pdf.sort_values("ts").iterrows():
                t = int(pd.Timestamp(r["ts"]).value // 1000)
                if (
                    stage < len(FUNNEL_STEPS)
                    and r["event_type"] == FUNNEL_STEPS[stage]
                    and t > ts_us
                ):
                    stage += 1
                    ts_us = t
        state.update((stage, ts_us))
        yield pd.DataFrame({"user_id": [key[0]], "stage": [stage]})

    return events.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
