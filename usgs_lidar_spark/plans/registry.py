"""Query registry: the QUERIES/ORACLE dicts, the @query decorator, and
the shared exactness helpers every query module builds on.

Split out of the single-file plans/queries.py in round 11; the six
q*_*.py tier modules register into THESE dicts at import time, and
plans/queries.py (still the public import surface) imports them in the
original definition order. See plans/queries.py for the oracle-hash
conventions each entry follows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from usgs_lidar_spark.catalog import load_table
from usgs_lidar_spark.operators.voxel import voxel_downsample

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a named query; `oracle` is the DuckDB-equivalent SQL."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _cached_index_path(
    sf_dir: str, kind: str, source_table: str, marker_sidecar: str
) -> tuple[str, bool]:
    """Deterministic per-(sf_dir, source snapshot) scratch path for a
    materialized index, so the index-served queries measure SERVING, not
    build-per-call, and repeated bench runs don't leak one orphan tempdir
    per invocation (ADVICE r7). The key folds in the source parquet's
    (mtime, size) so a regenerated testdata tree can never serve a stale
    index. Returns (path, is_complete): complete iff the index writer's
    LAST sidecar write left its `_SUCCESS` marker (`write_term_index`
    ends with `_corpus_stats`, `write_ivf_index` with `_centroids` — a
    crashed partial build fails the check and is rebuilt in place)."""
    import hashlib
    import os
    import tempfile

    src = os.path.join(sf_dir, f"{source_table}.parquet")
    try:
        st = os.stat(src)
        snap = f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        snap = "missing"
    key = hashlib.sha256(
        f"{os.path.abspath(sf_dir)}|{kind}|{snap}".encode()
    ).hexdigest()[:16]
    path = os.path.join(
        tempfile.gettempdir(), "usgs_lidar_index_cache", f"{kind}_{key}"
    )
    complete = os.path.exists(
        os.path.join(path, marker_sidecar, "_SUCCESS")
    )
    return path, complete


def dec_sum(col, digits: int = 2) -> F.Column:
    """Order-independent SUM of a fixed-point decimal column.

    Floating-point addition is not associative, so SUM(double) differs in
    the last ulp depending on partitioning — fatal for hash-compared
    results (observed live: ROUND(avg,4) flipping 13335.0988 vs .0987
    between Spark and DuckDB at sf0.01). The synthetic money columns carry
    exactly `digits` decimals, so summing scaled BIGINTs is exact and
    partition-order-independent at any scale. SQL twin: DEC_SUM below.
    """
    scale = 10**digits
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c * scale).cast("long")) / F.lit(float(scale))


def dec_avg(col, digits: int = 2) -> F.Column:
    """Order-independent AVG of a fixed-point decimal column. NOT rounded:
    the integer-sum/division result is already bit-deterministic, and
    ROUND on an exact decimal half is itself engine-dependent (Spark
    HALF_UPs the decimal rendering, C engines round the binary double)."""
    scale = 10**digits
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c * scale).cast("long")) / (
        F.lit(float(scale)) * F.count(F.lit(1))
    )


def DEC_SUM(expr: str, digits: int = 2) -> str:
    scale = 10**digits
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {scale}) AS BIGINT)) AS DOUBLE) / {scale}.0"
    )

