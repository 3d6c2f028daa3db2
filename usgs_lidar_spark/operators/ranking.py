"""Distributed EXACT global ranking — and the equi-depth histogram
built on it — without the single-task global window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY is correct and
convenient, but Spark executes it as ONE task holding the whole dataset
(WindowExec warns "Moving all data to a single partition"): a
correctness tool that dies at scale. The scalable exact construction is
the classic two-phase rank:

1. range-repartition by the order key (a parallel range exchange — the
   same machinery as a distributed sort), so partition i holds only
   keys strictly below partition i+1's;
2. count rows per partition — a #partitions-sized aggregate collected
   to the driver (bounded by cluster parallelism, NOT data size — the
   same bounded-collect class as the engine's file manifests);
3. rank locally within each partition (row_number partitioned by the
   range-partition id — every task ranks its own slice) and add the
   broadcast prefix-sum offset of the partitions before it.

The result is bit-identical to the global window at any partitioning —
range boundaries only decide WHERE a row is ranked, never what its rank
is, because the order is total (callers must include a tie-break).

Not in the reference (its sort surface is a driver-side pandas
sort_values, ``scripts/usgs_lidar.py:400-439``); this is engine
infrastructure for the analytics tier (equi-depth statistics, exact
top-percentile cuts) at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row_number under the TOTAL order
    ``order_cols`` (ascending), computed with no single-task stage.

    ``order_cols`` must be a total order (include a unique tie-break
    column) — with ties the ranking would depend on physical placement.
    Adds ``rank_col``; all input columns pass through.
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    cols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(*cols)
        if num_partitions is None
        else df.repartitionByRange(num_partitions, *cols)
    ).withColumn("__pid", F.spark_partition_id())
    # Partition counts: #partitions rows, bounded by parallelism.
    pc = sorted(
        (r["__pid"], r["cnt"])
        for r in ranged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    offsets, acc = [], 0
    for pid, cnt in pc:
        offsets.append((pid, acc))
        acc += cnt
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets or [], "__pid int, __offset long")
    w = Window.partitionBy("__pid").orderBy(*cols)
    return (
        ranged.join(F.broadcast(off_df), "__pid")
        .withColumn(
            rank_col,
            (F.col("__offset") + F.row_number().over(w)).cast("long"),
        )
        .drop("__pid", "__offset")
    )


def histogram_equidepth(
    df: DataFrame,
    value_col: str,
    tie_cols: list[str],
    buckets: int = 16,
) -> DataFrame:
    """Exact equi-depth (equal-frequency) histogram of ``value_col``:
    the ANALYZE-style statistic query optimizers build, computed
    distributed-exact via `global_rank`.

    Row with global rank r (1-based, order = value then ``tie_cols``)
    lands in bucket ``((r - 1) * buckets) div n`` — bucket populations
    differ by at most 1, assignment is a pure integer function of the
    rank, and boundary values fall out of the per-bucket min/max.
    Returns (bucket, n_rows, lo, hi) with lo/hi the bucket's exact
    value range. Bucket count must be positive; n < buckets simply
    yields fewer, single-row buckets.
    """
    if buckets <= 0:
        raise ValueError(f"buckets must be positive, got {buckets}")
    ranked = global_rank(df, [value_col, *tie_cols], rank_col="__r")
    # Total n as one scalar aggregate broadcast back (a global max
    # WINDOW would be a single-task stage — the thing this module
    # exists to avoid).
    total = ranked.agg(F.max("__r").alias("__n"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(
            "bucket", F.expr(f"((__r - 1) * {buckets}) div __n").cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(value_col).alias("lo"),
            F.max(value_col).alias("hi"),
        )
    )
