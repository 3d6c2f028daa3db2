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

from pyspark.sql import DataFrame, Window
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
