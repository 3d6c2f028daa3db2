"""Physical-plan assertions: the scale properties SURVEY.md §4 promises
must be visible in the executed plan, not just hoped for.

  * filters/projections reach the parquet scan (PushedFilters/ReadSchema);
  * small dimensions broadcast (BroadcastHashJoin, no shuffle of the fact
    side for dim joins);
  * aggregates are partial+final HashAggregate (map-side combine);
  * no CartesianProduct anywhere except the intended 1-row broadcasts.
"""

from __future__ import annotations

import pytest

from usgs_lidar_spark.plans.queries import QUERIES
from tests.conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMALL)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "f1_range_filter")
    assert "PushedFilters: [" in plan
    # The quantity range and linenumber predicates must be pushed.
    assert "l_linenumber" in plan.split("PushedFilters")[1][:300]


def test_column_pruning_reaches_scan(spark):
    plan = _plan(spark, "f1_range_filter")
    read = plan.split("ReadSchema")[1][:300]
    # Only the 4 projected columns are read — intensity of the reference's
    # late Python projection (SURVEY.md §4 "column pruning") done right.
    assert "l_extendedprice" in read and "l_returnflag" not in read


def test_dim_joins_broadcast(spark):
    plan = _plan(spark, "j1_broadcast_lookup")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_aggregate_is_partial_final_hash(spark):
    plan = _plan(spark, "flagship_voxel_subsample")
    # Two HashAggregates (partial + final) around one shuffle.
    assert plan.count("HashAggregate") >= 2
    assert "SortAggregate" not in plan


def test_no_cartesian_products(spark):
    for name in ("flagship_voxel_subsample", "j3_star_join_agg", "m2_grid_keys"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name


def test_topk_uses_take_ordered(spark):
    plan = _plan(spark, "o3_topk")
    assert "TakeOrderedAndProject" in plan  # heap top-k, not a global sort
