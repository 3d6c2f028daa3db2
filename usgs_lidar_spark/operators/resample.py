"""Time-series resampling: fixed-interval grids with gap-fill.

Absent from the reference (its time dimension is the catalog year), but
core engine surface for the events table: downsample an irregular event
stream onto a regular grid per key, then fill empty intervals — the step
between raw events and any windowed model input.

Spark design, no UDFs:
  * bucketing is integer arithmetic on the epoch (one groupBy shuffle,
    partial+final aggregate);
  * the dense grid comes from per-key `sequence()` over the key's
    observed [min, max] bucket range — an explode, not a cross join, so
    grid size is output-proportional and per-key (no global calendar
    join);
  * forward-fill is one `last(value, ignorenulls)` running window per
    key — the as-of trick reused on the grid.

Scale: one shuffle for the aggregate, one for the per-key window; grid
explosion is bounded by (span/step) per key. A key with a years-long gap
pays rows for that gap — callers bound `max_buckets` (guard below) the
same way viz frames are bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_events(
    events: DataFrame,
    ts_col: str,
    key_cols: list[str],
    agg_exprs: dict[str, Column],
    step_seconds: int,
) -> DataFrame:
    """Aggregate an event stream onto a fixed ``step_seconds`` grid per
    key: one output row per (key, occupied bucket), with ``bucket_start``
    timestamps. ``agg_exprs`` maps output name -> aggregate Column."""
    if step_seconds <= 0:
        raise ValueError(f"step_seconds must be positive, got {step_seconds}")
    bucket = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        / F.lit(step_seconds * 1_000_000)
    ).alias("__bucket")
    return (
        events.groupBy(*key_cols, bucket)
        .agg(*[c.alias(n) for n, c in agg_exprs.items()])
        .withColumn(
            "bucket_start",
            F.timestamp_seconds(F.col("__bucket") * step_seconds),
        )
    )


def gap_fill(
    resampled: DataFrame,
    key_cols: list[str],
    fill_cols: list[str],
    step_seconds: int,
    max_buckets: int | None = 100_000,
    method: str = "ffill",
) -> DataFrame:
    """Densify a resampled frame: emit EVERY bucket between each key's
    first and last occupied bucket, filling ``fill_cols`` on synthesized
    rows; `is_gap` marks them.

    ``method``: "ffill" carries the most recent occupied value forward
    (one running window); "linear" interpolates between the surrounding
    occupied buckets (a backward window supplies the next value/bucket —
    two windows total, still no joins). Interior gaps only either way:
    the grid starts/ends at occupied buckets.

    ``max_buckets`` guards the per-key explosion (a key spanning years at
    second resolution would detonate row counts); raise/None to disable.
    """
    if method not in ("ffill", "linear"):
        raise ValueError(f"unknown fill method: {method!r}")
    grid = resampled.groupBy(*key_cols).agg(
        F.min("__bucket").alias("__b0"), F.max("__bucket").alias("__b1")
    )
    if max_buckets is not None:
        rows = (
            grid.filter(F.col("__b1") - F.col("__b0") + 1 > max_buckets)
            .limit(1)
            .collect()
        )
        if rows:
            r = rows[0]
            raise ValueError(
                f"gap_fill: key {tuple(r[c] for c in key_cols)} spans "
                f"{int(r['__b1'] - r['__b0'] + 1)} buckets > max_buckets="
                f"{max_buckets}; coarsen step_seconds or raise the guard"
            )
    dense = grid.select(
        *key_cols,
        F.explode(F.sequence(F.col("__b0"), F.col("__b1"))).alias("__bucket"),
    )
    joined = dense.join(resampled, [*key_cols, "__bucket"], "left")
    # Gap = the resampled side was absent from the join — marked by its
    # (never-null-on-occupied-rows) bucket_start. Keying on a fill column
    # instead would mislabel an occupied bucket whose aggregate is
    # legitimately NULL (e.g. SUM over all-null values) as a gap and let
    # the fill overwrite real values.
    joined = joined.withColumn("is_gap", F.col("bucket_start").isNull()).drop(
        "bucket_start"
    )
    w_back = (
        Window.partitionBy(*key_cols)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*key_cols)
        .orderBy("__bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    out = joined
    if method == "ffill":
        # Fill only synthesized gap rows: an occupied bucket whose
        # aggregate is legitimately NULL keeps its NULL (same contract as
        # the linear branch). Gap rows take the most recent non-null
        # occupied value.
        for c in fill_cols:
            out = out.withColumn(
                c,
                F.when(
                    F.col("is_gap"), F.last(c, ignorenulls=True).over(w_back)
                ).otherwise(F.col(c)),
            )
    else:
        occupied = F.when(~F.col("is_gap"), F.col("__bucket"))
        prev_b = F.last(occupied, ignorenulls=True).over(w_back)
        next_b = F.first(occupied, ignorenulls=True).over(w_fwd)
        frac = (F.col("__bucket") - prev_b) / (next_b - prev_b)
        for c in fill_cols:
            prev_v = F.last(c, ignorenulls=True).over(w_back)
            next_v = F.first(c, ignorenulls=True).over(w_fwd)
            out = out.withColumn(
                c,
                F.when(~F.col("is_gap"), F.col(c)).otherwise(
                    prev_v + (next_v - prev_v) * frac
                ),
            )
    return out.withColumn(
        "bucket_start", F.timestamp_seconds(F.col("__bucket") * step_seconds)
    )
