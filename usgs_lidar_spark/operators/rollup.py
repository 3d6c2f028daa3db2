"""Incremental rollup maintenance: keep a grouped aggregate fresh by
merging new data's partial aggregates into the stored rollup — never
rescanning history.

The algebra: a rollup row stores, per group, the MERGEABLE state of each
measure (sum as scaled BIGINT, count, min, max — avg is derived
sum/count at read time, never stored). Any two states combine with
(+, +, least, greatest), so refresh = groupBy over the union of the
stored state and the new batch's state. That associativity is exactly
what Spark exploits for map-side partial aggregation inside one job;
this operator applies the same trick ACROSS jobs separated by days of
arrivals.

Scale: refresh cost is O(|batch| + |rollup|), independent of history
size — the property that keeps a 100 TB table's daily rollup affordable.
The merge shuffles on the group key only; if the stored rollup is
written bucketed by the key (sources/writers.write_bucketed), even that
shuffle drops to the batch side alone.

Not supported by design: non-algebraic measures (exact distinct counts,
medians) — those need sketches (HLL / quantile digests) whose merge
operators Spark exposes separately; see `sketch_approx_stats`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


#: measure spec: list of (source_expr_name, kind) with kind in
#: {"sum", "count", "min", "max"}.
_KINDS = {"sum", "count", "min", "max"}


def _state_col(col: str, kind: str, digits: int) -> F.Column:
    if kind == "sum":
        # scaled-BIGINT sum: exact, order-independent, mergeable by +
        return F.sum(F.round(F.col(col) * 10**digits).cast("long"))
    if kind == "count":
        return F.count(F.lit(1)).cast("long")
    if kind == "min":
        return F.min(col)
    return F.max(col)


def _merge_col(name: str, kind: str) -> F.Column:
    if kind in ("sum", "count"):
        return F.sum(name).cast("long")
    if kind == "min":
        return F.min(name)
    return F.max(name)


def rollup_state(
    rows: DataFrame,
    keys: list[str],
    measures: list[tuple[str, str]],
    digits: int = 2,
) -> DataFrame:
    """Aggregate raw rows into mergeable rollup state (one row per group,
    one state column per measure, named ``{col}_{kind}``)."""
    for col, kind in measures:
        if kind not in _KINDS:
            raise ValueError(f"unsupported measure kind: {kind}")
    aggs = [
        _state_col(col, kind, digits).alias(f"{col}_{kind}")
        for col, kind in measures
    ]
    return rows.groupBy(*keys).agg(*aggs)


def merge_rollup(
    stored: DataFrame,
    batch_state: DataFrame,
    keys: list[str],
    measures: list[tuple[str, str]],
) -> DataFrame:
    """Merge a new batch's rollup state into the stored rollup: union the
    two state tables and re-reduce with each measure's merge operator.
    Exactly equivalent to aggregating history+batch from scratch (the
    states are associative), at O(|rollup| + |batch|) cost."""
    aggs = [
        _merge_col(f"{col}_{kind}", kind).alias(f"{col}_{kind}")
        for col, kind in measures
    ]
    return stored.unionByName(batch_state).groupBy(*keys).agg(*aggs)
