"""Grouped-map (applyInPandas) custom per-group algorithms.

The one UDF shape the engine had not yet exercised: groupBy().applyInPandas
hands each group to Python as a whole pandas frame — the escape hatch for
per-group algorithms with no aggregate/window decomposition (model fits,
solvers, per-entity optimizers). Everything that CAN be an aggregate
should be (see the D1 discipline note in SURVEY §2); this module keeps the
pattern honest with an algorithm that needs per-group matrix math but is
still engine-reproducible.

Determinism contract (the part worth copying): inside the UDF all sums are
int64-exact (pandas int64 columns of bounded products), and the only
floating-point operations are final divisions — so the result is
bit-identical across partitionings, retries, AND engines, which lets the
driver's DuckDB oracle hash-compare a Python-UDF query, something
float-accumulating UDFs can never offer.

Scale: applyInPandas shuffles once on the group key and materializes ONE
GROUP AT A TIME per task in memory — fine for per-entity series (bounded
by an entity's own history), wrong for groups that can be a large corpus
share; the docstring of each function states its bound.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

TREND_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("slope_per_hour", T.DoubleType()),
        T.StructField("intercept", T.DoubleType()),
    ]
)


def user_value_trend(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    digits: int = 2,
) -> DataFrame:
    """Per-user OLS trend of ``value`` over time: slope (per hour) and
    intercept at the user's first event, via the closed-form normal
    equations computed in EXACT int64 arithmetic per group.

    Per group: t = seconds since the user's min ts (rebased so products
    fit int64: offsets < ~1e9 s, cents < ~1e9 -> every Σ term < 2^62 for
    per-entity series), v = value scaled to 10^digits. Then
        slope = (nΣtv − ΣtΣv) / (nΣtt − (Σt)²)
    with a single double division at the end (NULL slope for degenerate
    groups: n < 2 or zero time variance). Users with any NULL value keep
    those rows excluded (SQL aggregate semantics).

    State bound: one user's events in memory per task — per-entity
    history, not corpus-share. A group that could be 1% of a 100 TB
    table does NOT belong in applyInPandas.
    """
    scale = 10**digits

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        uid = int(pdf["__k"].iloc[0])
        pdf = pdf.dropna(subset=["__v"])
        n = len(pdf)
        if n == 0:
            return pd.DataFrame(
                {"user_id": [uid], "n": [0], "slope_per_hour": [None],
                 "intercept": [None]}
            )
        t = (pdf["__ts_s"] - pdf["__ts_s"].min()).astype("int64")
        v = pdf["__v"].astype("int64")
        st, sv = int(t.sum()), int(v.sum())
        stt, stv = int((t * t).sum()), int((t * v).sum())
        den = n * stt - st * st
        # float() BEFORE dividing — mirrors how a SQL engine evaluates
        # CAST(bigint AS DOUBLE)/CAST(bigint AS DOUBLE): operands round
        # to double first. Python's exact-rational int/int division can
        # differ in the last ulp once numerators exceed 2^53, which
        # would break cross-engine hash equality.
        if n < 2 or den == 0:
            slope = None
            intercept = (float(sv) / n) / scale
        else:
            num = n * stv - st * sv
            slope = (float(num) / float(den)) * 3600.0 / scale  # units/hour
            intercept = (float(sv * stt - st * stv) / float(den)) / scale
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n": [n],
                "slope_per_hour": [slope],
                "intercept": [intercept],
            }
        )

    prepped = events.select(
        F.col(key_col).alias("__k"),
        F.unix_seconds(F.col(ts_col).cast("timestamp")).alias("__ts_s"),
        F.round(F.col(value_col) * scale).cast("long").alias("__v"),
    )
    return prepped.groupBy("__k").applyInPandas(fit, TREND_SCHEMA)
