"""Skew mitigation utilities.

At 100 TB a handful of hot keys (one giant region, one viral document
source) can pin a shuffle partition to a single executor. Two standard
remedies, both expressed as plain DataFrame rewrites:

  * salted aggregation — add a random-ish salt to the group key, aggregate
    partially per (key, salt), then re-aggregate per key. The first
    shuffle spreads the hot key over `salt` partitions; the second moves
    only `salt` rows per key. (Spark's own partial aggregation does this
    implicitly for algebraic aggregates; explicit salting is the tool for
    the cases that defeat it — e.g. exact count-distinct per key.)
  * AQE skew-join splitting — enabled session-wide in session.py
    (spark.sql.adaptive.skewJoin.enabled): oversized join partitions are
    split at runtime. For joins that AQE can't fix (broadcast-ineligible
    non-equi), replicate-the-small-side salting applies.

The salt uses a deterministic hash of a tie-break column — not rand() —
so results are reproducible run-to-run (the engine's global rule).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    distinct_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Exact COUNT(DISTINCT x) per key, skew-safe.

    Plain `groupBy(key).agg(countDistinct(x))` shuffles every (key, x)
    row to the key's single partition — the hot key serializes. Salting
    by hash(x) spreads the hot key's distinct-set across `salt_buckets`
    partitions; each bucket counts its disjoint slice of the value space
    (hash-partitioned, so no value appears in two buckets) and the per-key
    sum of bucket counts is exact.

    Output: keys + `n_distinct`.
    """
    salt = (F.xxhash64(F.col(distinct_col)) % salt_buckets).alias("__salt")
    partial = (
        df.select(*keys, F.col(distinct_col), salt)
        .groupBy(*keys, "__salt")
        .agg(F.countDistinct(distinct_col).alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias("n_distinct"))


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    sum_col: Column,
    out_name: str,
    salt_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage salted SUM for workloads where map-side partial
    aggregation is defeated (very high group cardinality per partition).
    `salt_col` must be a column whose hash spreads the hot key's rows."""
    salt = (F.xxhash64(F.col(salt_col)) % salt_buckets).alias("__salt")
    partial = (
        df.select(*keys, sum_col.alias("__v"), salt)
        .groupBy(*keys, "__salt")
        .agg(F.sum("__v").alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias(out_name))
