"""Whole-registry degenerate-input sweeps: every queries() entry must
execute when every table has zero rows, and again when every table has
exactly one row (degenerate windows, zero variances, single-element
groups).

Why this matters at scale: empty inputs are not an edge case on a real
cluster — a partition-pruned scan, a day with no late data, a tenant
with no documents all produce empty frames mid-pipeline, and an
operator that only works on non-empty input fails exactly when a filter
gets more selective. The similarity-index queries originally crashed
here (quantizer seeds collected from the corpus); they now fall back to
a placeholder quantizer whose plan executes over the empty scan to an
empty, correctly-typed result.
"""

from __future__ import annotations

import pytest

from usgs_lidar_spark.catalog import load_table
from usgs_lidar_spark.plans.queries import QUERIES
from usgs_lidar_spark.schemas import TABLE_NAMES
from tests.conftest import SF_SMALL


def _staged_dir(spark, tmp_path_factory, n_rows: int) -> str:
    dst = tmp_path_factory.mktemp(f"sf_{n_rows}row")
    for t in TABLE_NAMES:
        raw = spark.read.parquet(f"{SF_SMALL}/{t}.parquet")
        raw.limit(n_rows).write.mode("overwrite").parquet(
            str(dst / f"{t}.parquet")
        )
    return str(dst)


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    return _staged_dir(spark, tmp_path_factory, 0)


@pytest.fixture(scope="module")
def one_row_sf_dir(spark, tmp_path_factory):
    return _staged_dir(spark, tmp_path_factory, 1)


def _sweep(spark, sf_dir):
    failures = []
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name](spark, sf_dir)
            df.count()
            assert len(df.columns) > 0
        except Exception as e:  # noqa: BLE001 - collecting a full report
            failures.append((name, repr(e)[:160]))
    assert not failures, failures


def test_every_query_runs_on_empty_tables(spark, empty_sf_dir):
    _sweep(spark, empty_sf_dir)


def test_every_query_runs_on_one_row_tables(spark, one_row_sf_dir):
    """One row everywhere: single-element windows, zero variances
    (events_zscore_outliers divided 0/0 here before its guard),
    self-joins with one candidate, quantizers seeded from one vector."""
    _sweep(spark, one_row_sf_dir)


def test_empty_tables_load(spark, empty_sf_dir):
    for t in TABLE_NAMES:
        assert load_table(spark, empty_sf_dir, t).count() == 0
