"""Custom stateful streaming via transformWithStateInPandas (Spark 4).

``applyInPandasWithState`` (streaming/stateful.py) is the Spark 3.x
escape hatch; Spark 4 replaced it with the StatefulProcessor API —
typed, named state variables managed per key by the state store,
lifecycle hooks, and (in TimeMode other than None) registered timers.
This module is the engine's TWS-native operator, kept alongside the
legacy one so both stateful surfaces stay covered.

The operator maintains per-user running MOMENTS — event count, exact
sum, exact sum of squares — in scaled-integer cents (the engine's
determinism rule: integer state is replay/partition-order independent;
float accumulation would drift). Each micro-batch emits the user's
updated mean and population variance, derived from the integer moments
at emit time with one double division each.

State size is three longs per distinct user — RocksDB-resident on a
real cluster, O(keys) not O(events); cents^2 sums stay far inside
int64 for value domains up to ~1e6 cents per event and ~1e6 events
per key.

Runtime gate: Spark's TWS Python runner needs a working
``google.protobuf`` (its state-server protocol is protobuf-framed);
``have_tws_runtime()`` probes for it, and the parity test skips where
the dependency is absent — the same import-gating contract as pyproj
(projection) and PIL (multimodal decode).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from usgs_lidar_spark.streaming.stateful import to_cents_half_up

OUTPUT_SCHEMA = (
    "user_id long, n_events long, value_sum double, value_mean double, "
    "value_var double"
)


def _moments_processor():
    """Build the StatefulProcessor class lazily (pyspark import at call
    time keeps module import cheap and dependency-gated)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class MomentsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "moments", "n long, cents long, cents_sq long"
            )

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            if self._state.exists():
                n, cents, cents_sq = self._state.get()
            else:
                n, cents, cents_sq = 0, 0, 0
            for pdf in rows:
                c = to_cents_half_up(pdf["value"])
                n += len(pdf)
                cents += int(c.sum())
                cents_sq += int((c * c).sum())
            self._state.update((n, cents, cents_sq))
            mean_c = cents / n
            var_c = cents_sq / n - mean_c * mean_c
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "value_sum": [cents / 100.0],
                    "value_mean": [mean_c / 100.0],
                    "value_var": [var_c / 10000.0],
                }
            )

        def close(self) -> None:
            pass

    return MomentsProcessor()


def track_user_moments_tws(events: DataFrame) -> DataFrame:
    """events (streaming, user_id/value) -> running per-user moments via
    the Spark 4 StatefulProcessor API (Update mode, no timers)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_moments_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def have_tws_runtime() -> bool:
    """True when the protobuf runtime Spark's TWS python runner needs is
    importable (probed exactly as the runner imports it)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False
