"""The local correctness gate: every registered query vs its DuckDB oracle
at sf0.001 — a fast replica of what the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from usgs_lidar_spark.plans.queries import ORACLE, QUERIES
from tests.conftest import SF_SMALL
from tests.parity import assert_parity

ORACLED = sorted(ORACLE)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    con = duck(SF_SMALL)
    spark_df = QUERIES[name](spark, SF_SMALL)
    duck_df = con.execute(ORACLE[name]).fetchdf()
    assert_parity(spark_df, duck_df, name=name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, name):
    """Queries without a SQL oracle (non-SQL-expressible) must still run."""
    df = QUERIES[name](spark, SF_SMALL)
    assert df.count() >= 0
