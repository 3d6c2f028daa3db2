"""Whole-registry empty-input sweep: every queries() entry must execute
(and return a well-formed, usually empty, frame) when every table has
zero rows.

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


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    dst = tmp_path_factory.mktemp("sf_empty")
    for t in TABLE_NAMES:
        raw = spark.read.parquet(f"{SF_SMALL}/{t}.parquet")
        raw.limit(0).write.mode("overwrite").parquet(str(dst / f"{t}.parquet"))
    return str(dst)


def test_every_query_runs_on_empty_tables(spark, empty_sf_dir):
    failures = []
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name](spark, empty_sf_dir)
            df.count()
            assert len(df.columns) > 0
        except Exception as e:  # noqa: BLE001 - collecting a full report
            failures.append((name, repr(e)[:160]))
    assert not failures, failures


def test_empty_tables_load(spark, empty_sf_dir):
    for t in TABLE_NAMES:
        assert load_table(spark, empty_sf_dir, t).count() == 0
