"""Distributed as-of (point-in-time) join.

Absent from the reference (SURVEY.md §2 J3 notes it as required engine
surface). Semantics: for each left row, attach the payload of the most
recent right row with ``right.ts <= left.ts`` within the same partition
key(s) — a time-series lookup (e.g. "the last purchase before this click").

Spark design — the union trick, one shuffle, no range-join explosion:
  1. tag both sides and union them (schema-aligned);
  2. single shuffle on the partition keys, sort within partitions by
     (ts, side) — right rows sort *before* left rows at equal ts so
     `<=` semantics hold;
  3. running `last(payload, ignorenulls)` window carries the latest right
     payload forward onto every subsequent left row;
  4. keep left rows; matched payload is NULL when no right row precedes
     (drop those for inner semantics).

At 100 TB this is the right physical plan: both sides shuffle once on the
equi-key, Spark's window sort is a per-partition external sort (spills,
never driver-bound), and no O(n*m) range join is materialized. A naive
`left.ts >= right.ts` non-equi join would be a BroadcastNestedLoopJoin —
quadratic and driver-broadcast-bound.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    partition_keys: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    tie_break: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """As-of join: latest right row with ts <= left ts, per partition key.

    `payload_cols` are taken from `right` and appended to `left`'s columns
    with an ``asof_`` prefix (including ``asof_<ts_col>``).

    `tie_break`: column making right-side ordering total when two right
    rows share a timestamp (required for deterministic results).
    """
    assert how in ("inner", "left")
    side = F.lit(1)
    payload = F.struct(
        F.col(ts_col).alias(f"asof_{ts_col}"),
        *[F.col(c).alias(f"asof_{c}") for c in payload_cols],
    )

    left_cols = left.columns
    r = right.select(
        *[F.col(k) for k in partition_keys],
        F.col(ts_col),
        *([F.col(tie_break).alias("__tie")] if tie_break else [F.lit(0).alias("__tie")]),
        F.lit(1).alias("__is_right"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in (*partition_keys, ts_col)],
    )
    l = left.select(
        *[F.col(k) for k in partition_keys],
        F.col(ts_col),
        F.lit(0).alias("__tie"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c) for c in left_cols if c not in (*partition_keys, ts_col)],
    )
    unioned = r.unionByName(l)

    # Right rows first at equal ts (`__is_right` DESC) => `<=` semantics.
    w = (
        Window.partitionBy(*partition_keys)
        .orderBy(F.col(ts_col).asc(), F.col("__is_right").desc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))

    out = carried.filter(F.col("__is_right") == 0).select(
        *left_cols, F.col("__match.*")
    )
    if how == "inner":
        out = out.filter(F.col(f"asof_{ts_col}").isNotNull())
    return out


def asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    partition_keys: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    bucket_width_seconds: int,
    tie_break: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """As-of join for HOT partition keys: salt the timeline into
    ``bucket_width_seconds`` buckets so one key's window sort spreads over
    many tasks instead of one (the skew.py pattern applied on the ts
    dimension, as SCALE.md's as-of audit prescribes).

    Two passes, both bounded:
      1. the union-trick as-of runs partitioned by (keys, bucket) — the
         big shuffle and the external sort are per-bucket now;
      2. left rows with no in-bucket match take the carry-in: the last
         right payload of any PRIOR bucket, computed on per-bucket
         summaries (max_by over each bucket's right rows, then a running
         last over the summary rows — one row per (key, bucket), tiny).

    Output and semantics are identical to ``asof_join`` (equivalence is
    pinned by test); requires a timestamp ``ts_col``.
    """
    assert how in ("inner", "left")
    width_us = int(bucket_width_seconds) * 1_000_000
    # cast("timestamp") accepts NTZ columns too (the events loader emits
    # NTZ); with the engine's UTC session the mapping is deterministic,
    # and any monotonic mapping yields correct buckets.
    bkt = lambda c: F.floor(  # noqa: E731
        F.unix_micros(F.col(c).cast("timestamp")) / F.lit(width_us)
    )

    l2 = left.withColumn("__bkt", bkt(ts_col))
    r2 = right.withColumn("__bkt", bkt(ts_col))
    keys2 = [*partition_keys, "__bkt"]

    in_bucket = asof_join(
        l2, r2, keys2, ts_col, payload_cols, tie_break=tie_break, how="left"
    )

    payload = F.struct(
        F.col(ts_col).alias(f"asof_{ts_col}"),
        *[F.col(c).alias(f"asof_{c}") for c in payload_cols],
    )
    order = F.struct(
        F.col(ts_col),
        (F.col(tie_break) if tie_break else F.lit(0)).alias("__tie"),
    )
    summaries = r2.groupBy(*partition_keys, "__bkt").agg(
        F.max_by(payload, order).alias("__last_payload")
    )
    # Left buckets with NO right rows still need a carry row: union a null
    # marker per distinct left (key, bucket) into the summary timeline.
    # Markers sort BEFORE the same bucket's summary, so a marker's
    # running-last sees strictly-prior buckets only (same-bucket right
    # rows are pass 1's job and may postdate the left rows).
    ptype = summaries.schema["__last_payload"].dataType
    markers = (
        l2.select(*partition_keys, "__bkt")
        .distinct()
        .withColumn("__last_payload", F.lit(None).cast(ptype))
        .withColumn("__is_sum", F.lit(0))
    )
    wprior = (
        Window.partitionBy(*partition_keys)
        .orderBy(F.col("__bkt").asc(), F.col("__is_sum").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        summaries.withColumn("__is_sum", F.lit(1))
        .unionByName(markers)
        .withColumn(
            "__carry", F.last("__last_payload", ignorenulls=True).over(wprior)
        )
        .filter(F.col("__is_sum") == 0)
        .select(*partition_keys, "__bkt", "__carry")
    )

    joined = in_bucket.join(carry, keys2, "left")
    match_ts = F.col(f"asof_{ts_col}")
    fixed = [
        F.when(match_ts.isNotNull(), F.col(f"asof_{c}"))
        .otherwise(F.col(f"__carry.asof_{c}"))
        .alias(f"asof_{c}")
        for c in (ts_col, *payload_cols)
    ]
    out = joined.select(
        *[c for c in left.columns], *fixed
    )
    if how == "inner":
        out = out.filter(F.col(f"asof_{ts_col}").isNotNull())
    return out


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    partition_keys: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    tolerance: int,
    tie_break: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Nearest-event join: attach the right row closest in time to each
    left row (EITHER direction) within ``tolerance``, per partition key —
    the sensor-alignment / nearest-measurement cousin of the as-of join
    (which is strictly backward-looking).

    Deterministic choice: minimize (|dt|, right ts, tie) — so an exact
    tie between a past and a future candidate resolves to the PAST one,
    and equal-timestamp right rows resolve by ``tie_break``. ``tolerance``
    is in the timestamp's native unit (microseconds for timestamp
    columns, raw units for numeric ts). Output appends
    ``nearest_<ts>``/``nearest_<payload>`` and the signed
    ``nearest_dt`` (right - left); `how='left'` keeps unmatched rows.

    Physical plan — the same union trick as asof_join but with TWO
    windows over ONE shuffle: both sides union, exchange once on the
    partition keys, then a forward-ordered and a backward-ordered
    running `last(ignorenulls)` produce the nearest candidate on each
    side of every left row (Spark reuses the exchange; the second
    window adds only a per-partition re-sort). No range join, no
    candidate explosion: exactly two candidates per left row are ever
    materialized, however dense the right side is inside the tolerance
    window.
    """
    assert how in ("inner", "left")
    is_ts = "timestamp" in dict(left.dtypes)[ts_col]

    def tsn(col):
        c = F.col(col)
        return F.unix_micros(c.cast("timestamp")) if is_ts else c.cast("long")

    left_cols = left.columns
    payload = F.struct(
        F.col(ts_col).alias(f"nearest_{ts_col}"),
        *[F.col(c).alias(f"nearest_{c}") for c in payload_cols],
        tsn(ts_col).alias("__rtsn"),
    )
    r = right.select(
        *[F.col(k) for k in partition_keys],
        tsn(ts_col).alias("__tsn"),
        (F.col(tie_break) if tie_break else F.lit(0)).alias("__tie"),
        F.lit(1).alias("__is_right"),
        payload.alias("__payload"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
            if c not in partition_keys
        ],
    )
    l = left.select(
        *[F.col(k) for k in partition_keys],
        tsn(ts_col).alias("__tsn"),
        F.lit(0).alias("__tie"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c) for c in left_cols if c not in partition_keys],
    )
    u = r.unionByName(l)

    # Backward: latest right at ts <= L; equal-ts rights sort tie DESC so
    # the carried last() is the SMALLEST tie. Forward mirrors in reverse.
    w_back = (
        Window.partitionBy(*partition_keys)
        .orderBy(F.col("__tsn").asc(), F.col("__is_right").desc(), F.col("__tie").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*partition_keys)
        .orderBy(F.col("__tsn").desc(), F.col("__is_right").desc(), F.col("__tie").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cand = (
        u.withColumn("__back", F.last("__payload", ignorenulls=True).over(w_back))
        .withColumn("__fwd", F.last("__payload", ignorenulls=True).over(w_fwd))
        .filter(F.col("__is_right") == 0)
    )

    back_dt = F.col("__back.__rtsn") - F.col("__tsn")   # <= 0
    fwd_dt = F.col("__fwd.__rtsn") - F.col("__tsn")     # >= 0
    back_ok = F.col("__back").isNotNull() & (-back_dt <= tolerance)
    fwd_ok = F.col("__fwd").isNotNull() & (fwd_dt <= tolerance)
    # past wins exact |dt| ties
    use_back = back_ok & (~fwd_ok | (-back_dt <= fwd_dt))
    chosen = F.when(use_back, F.col("__back")).when(fwd_ok, F.col("__fwd"))
    dt = F.when(use_back, back_dt).when(fwd_ok, fwd_dt)

    out = cand.select(
        *left_cols,
        chosen.alias("__m"),
        dt.alias("nearest_dt"),
    ).select(*left_cols, F.col("__m.*"), "nearest_dt").drop("__rtsn")
    if how == "inner":
        out = out.filter(F.col(f"nearest_{ts_col}").isNotNull())
    return out


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    partition_keys: Sequence[str],
    bucket_width: int,
    start_col: str = "start",
    end_col: str = "end",
    suffix: str = "_r",
) -> DataFrame:
    """All pairs of overlapping intervals (half-open [start, end)) between
    two interval tables, per partition key — the temporal sibling of the
    grid-bucketed spatial join.

    Plan: each interval EXPLODES to the fixed-width time buckets it
    touches, candidates come from the (keys, bucket) equi-join, the
    exact predicate (l.start < r.end AND r.start < l.end) filters, and a
    distinct collapses pairs that met in several buckets. Cost is
    sum-over-buckets of |left| x |right| per bucket — bounded by sizing
    ``bucket_width`` near the typical interval length; a naive theta
    join is per-key quadratic with no such bound.

    Bounds must be integer-comparable (epoch seconds/days/micros).
    Output: left columns + right's non-key columns with ``suffix``.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    w = int(bucket_width)

    def buckets(s: Column, e: Column) -> Column:
        return F.sequence(
            F.floor(s / w).cast("long"), F.floor((e - 1) / w).cast("long")
        )

    l = left.withColumn("__b", F.explode(buckets(F.col(start_col), F.col(end_col))))
    rcols = [c for c in right.columns if c not in partition_keys]
    r = right.select(
        *partition_keys, *[F.col(c).alias(c + suffix) for c in rcols]
    )
    r = r.withColumn(
        "__b",
        F.explode(buckets(F.col(start_col + suffix), F.col(end_col + suffix))),
    )
    overlap = (F.col(start_col) < F.col(end_col + suffix)) & (
        F.col(start_col + suffix) < F.col(end_col)
    )
    return (
        l.join(r, [*partition_keys, "__b"])
        .filter(overlap)
        .drop("__b")
        .distinct()
    )
