"""Voxel-grid downsampling — the reference's flagship aggregate (A2).

Reference: ``subsample`` at /root/reference/scripts/usgs_lidar.py:400-439 —
computes integer voxel keys ``(p - min(p)) // voxel_size`` per axis
(line 416), groups with ``np.unique(..., return_inverse, return_counts)``
(a sort-based GROUP BY), then takes the per-voxel mean ("barycenter") in a
serial Python loop (lines 423-427). Demo: 401,577 points -> 60,998 voxels at
res=3 (notebooks/demo.ipynb cells 19/21), <=34 s single-process.

Spark design: two hash aggregates, zero driver round-trips.
  1. global per-axis MIN — a 1-row DataFrame;
  2. broadcast that row into every partition (BroadcastNestedLoopJoin of a
     single row — constant cost at any scale), compute voxel keys with pure
     column arithmetic, and hash-aggregate AVG/COUNT per key. Partial
     (map-side) aggregation means the shuffle carries one row per
     (partition, voxel), not per point — at 100 TB the shuffle volume is
     bounded by voxel count, not point count. No sort anywhere (the
     reference's np.unique/argsort sort is an artifact of numpy's API).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def voxel_keys(
    df: DataFrame,
    axes: Sequence[str],
    resolutions: Sequence[float],
) -> DataFrame:
    """Attach integer voxel-key columns ``i<axis>`` anchored at global mins.

    Equivalent of /root/reference/scripts/usgs_lidar.py:416 — but the global
    min is computed distributed and broadcast, never collected to the driver.
    """
    mins = df.agg(*[F.min(a).alias(f"__min_{a}") for a in axes])
    keyed = df.crossJoin(F.broadcast(mins))
    for a, r in zip(axes, resolutions):
        keyed = keyed.withColumn(
            f"i{a}",
            F.floor((F.col(a) - F.col(f"__min_{a}")) / F.lit(float(r))).cast("long"),
        )
    return keyed.drop(*[f"__min_{a}" for a in axes])


def voxel_downsample(
    df: DataFrame,
    axes: Sequence[str],
    resolutions: Sequence[float],
    round_digits: int | None = 4,
    exact_decimals: Sequence[int] | None = None,
    value_cols: Sequence[str] = (),
) -> DataFrame:
    """Barycenter decimation: one output row per occupied voxel.

    Output columns: ``i<axis>`` (voxel key, long), ``c<axis>`` (barycenter,
    double), ``c<value>`` (mean of each ``value_cols`` entry — columns
    averaged within the voxel without participating in the grid key, e.g.
    elevation over an (x, y) grid), ``n_points`` (long).

    ``exact_decimals``: when the source values are fixed-point decimals
    (d digits), the barycenter is computed as an integer sum of scaled
    values divided once at the end — the aggregate is then independent of
    partitioning/summation order (floating-point addition is not
    associative; a plain AVG of doubles can differ in the last ulp between
    runs/engines, which matters when results are hash-compared). This is
    also the scale-safe form: a 100 TB shuffle re-partition cannot change
    the answer.
    """
    keyed = voxel_keys(df, axes, resolutions)
    aggs = []
    for i, a in enumerate(axes):
        if exact_decimals is not None:
            # Exact path: integer sum / single division — bit-deterministic,
            # so it must NOT be rounded afterwards (ROUND(0.08625, 4) is
            # itself engine-dependent: Spark rounds the decimal rendering
            # HALF_UP, C engines round the binary double — observed live).
            scale = 10 ** exact_decimals[i]
            c = F.sum(F.round(F.col(a) * scale).cast("long")) / (
                F.lit(float(scale)) * F.count(F.lit(1))
            )
        else:
            c = F.avg(a)
            if round_digits is not None:
                c = F.round(c, round_digits)
        aggs.append(c.alias(f"c{a}"))
    for v in value_cols:
        c = F.avg(v)
        if round_digits is not None:
            c = F.round(c, round_digits)
        aggs.append(c.alias(f"c{v}"))
    aggs.append(F.count(F.lit(1)).alias("n_points"))
    return keyed.groupBy(*[f"i{a}" for a in axes]).agg(*aggs)
