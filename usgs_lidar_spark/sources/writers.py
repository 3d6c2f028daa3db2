"""Sinks (SURVEY.md §2 K1-K2) and the storage layout that replaces the
EPT octree.

The reference's spatial index is the EPT octree walked by PDAL
(/root/reference/pipeline.json:3-9). The engine's equivalent
(SURVEY.md §4 row 1) is table LAYOUT:
  * hive-partition by (region, year) — partition pruning == the catalog
    pre-filter;
  * sort within partitions by (x, y) before writing — parquet row-group
    min/max stats on x/y become the octree's node bounds, so a bbox
    predicate skips row groups at scan time (verified in tests by
    PushedFilters + row-group pruning).
A z-order/hilbert curve would interleave x/y better for square queries;
linear (x, y) sort is the dependency-free approximation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_points_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("region", "year"),
    sort_cols: tuple[str, ...] = ("x", "y"),
    mode: str = "overwrite",
) -> None:
    """Write the point table with the octree-analog layout."""
    (
        df.repartition(*[df[c] for c in partition_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_catalog(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Single distributed write after the crawl — the reference rewrote its
    CSV once per crawled row (scripts/usgs_lidar.py:273, O(n^2)); here the
    catalog is small, so coalesce(1) gives one tidy file."""
    df.coalesce(1).write.mode(mode).option("header", True).csv(path)


def read_points(spark: SparkSession, path: str) -> DataFrame:
    """Scan the partitioned point table (partition columns recovered from
    directory layout)."""
    return spark.read.parquet(path)
