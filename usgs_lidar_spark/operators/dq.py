"""Data-quality constraint checks: uniqueness, completeness, referential
integrity, and range conformance — the assertions a pipeline runs before
promoting a batch, as one DataFrame job per report.

Design: every check reduces to an aggregate or an anti-join, and the
report unions their (constraint, violations, checked) rows — a handful
of scans that Catalyst schedules independently, each partial-aggregated
map-side. Nothing collects to the driver; the report itself is a
per-constraint summary (violation COUNTS, not violating rows — at 100 TB
the row-level drill-down is a follow-up filtered query, not something to
ship with every report).

* uniqueness: groupBy(key) HAVING count>1, reduced to the number of
  duplicated keys and surplus rows;
* completeness: null counts per column in ONE pass over the table
  (conditional sums share the scan);
* referential integrity: left_anti join child->parent, counting orphans
  (the parent side is a broadcastable distinct of the key);
* range: conditional count of out-of-bound values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _report_row(df: DataFrame, constraint: str, violations: Column, checked: Column):
    return df.agg(
        F.lit(constraint).alias("constraint"),
        violations.cast("long").alias("violations"),
        checked.cast("long").alias("checked"),
    )


def check_unique(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """One row: how many key values occur more than once, and how many
    surplus rows those duplicates add."""
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    return per_key.agg(
        F.lit(f"unique({','.join(key_cols)})").alias("constraint"),
        F.sum(F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0))
        .cast("long")
        .alias("violations"),
        F.sum("n").cast("long").alias("checked"),
    )


def check_not_null(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per column, all computed in a single scan."""
    aggs = []
    for c in cols:
        aggs.append(
            F.struct(
                F.lit(f"not_null({c})").alias("constraint"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("violations"),
                F.count(F.lit(1)).cast("long").alias("checked"),
            ).alias(c)
        )
    one = df.agg(*aggs)
    stacked = one.select(
        F.explode(F.array(*[F.col(c) for c in cols])).alias("r")
    )
    return stacked.select("r.constraint", "r.violations", "r.checked")


def check_foreign_key(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
) -> DataFrame:
    """Orphan count: child rows whose key has no parent. The parent key
    set is distinct-reduced first (broadcastable for dimension tables);
    NULL child keys are not orphans (SQL FK semantics)."""
    pk = parent.select(F.col(parent_key).alias(child_key)).distinct()
    non_null = child.filter(F.col(child_key).isNotNull())
    orphans = non_null.join(pk, child_key, "left_anti")
    n_orphans = orphans.agg(F.count(F.lit(1)).alias("n"))
    n_checked = non_null.agg(F.count(F.lit(1)).alias("n"))
    return n_orphans.crossJoin(
        F.broadcast(n_checked.withColumnRenamed("n", "c"))
    ).select(
        F.lit(f"foreign_key({child_key})").alias("constraint"),
        F.col("n").cast("long").alias("violations"),
        F.col("c").cast("long").alias("checked"),
    )


def check_in_range(df: DataFrame, col: str, lo, hi) -> DataFrame:
    return _report_row(
        df,
        f"range({col} in [{lo},{hi}])",
        F.sum(
            F.when(F.col(col).isNull() | ~F.col(col).between(lo, hi), 1).otherwise(0)
        ),
        F.count(F.lit(1)),
    )


def dq_report(checks: list[DataFrame]) -> DataFrame:
    """Union the per-check summaries into one report frame."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def profile_numeric(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-scan numeric profile: (col_name, n_rows, n_null, n_distinct,
    min_value, max_value) for every listed column.

    Plan shape: ONE pass over the table — each column's struct(name,
    value) rides an inline array that posexplode fans out to (name,
    value) rows, then a single hash aggregate per column name computes
    the stats. The naive per-column loop would scan the table
    len(cols) times; this scans once and shuffles only len(cols) rows
    per partition's worth of partial aggregates. n_distinct is exact
    (count distinct over the value column — two-stage under AQE);
    swap in approx_count_distinct when a sketch suffices.
    """
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(c).cast("double").alias("value"),
            )
            for c in cols
        ]
    )
    exploded = df.select(F.explode(pairs).alias("p")).select(
        F.col("p.col_name").alias("col_name"), F.col("p.value").alias("value")
    )
    return exploded.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null"),
        F.countDistinct("value").alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def suppress_rare_groups(
    df: DataFrame,
    quasi_cols: list[str],
    k: int | None = None,
    k_frac: float | None = None,
    mode: str = "null",
) -> DataFrame:
    """k-ANONYMITY suppression over quasi-identifier columns — the
    privacy rung above `redact.redact_pii` (which scrubs direct
    identifiers INSIDE values; this guards the COMBINATION attack: a
    rare (lang, source, ...) tuple re-identifies a row even with every
    direct identifier scrubbed, Sweeney's classic linkage result). Rows
    whose quasi-identifier group has fewer than k members either have
    those columns NULLed (``mode='null'``, the suppress-to-generalize
    release shape) or are dropped (``mode='drop'``); every surviving
    row carries ``group_n`` and ``suppressed`` for audit.

    ``k_frac`` is the SCALE-STABLE form — k = ceil(k_frac * corpus
    rows) — for the same reason as the shingle df-cap's fraction: an
    absolute k silently loosens as the corpus grows (every group's
    population scales with the corpus while the threshold doesn't).
    The denominator rides the one-row-broadcast crossJoin idiom (zero
    extra corpus passes); exactly one of ``k``/``k_frac`` must be set.

    Plan shape: ONE shuffle — the group count is a window over the
    quasi columns (spillable per-group state, same argument as the
    df-cap window), the threshold comparison and the NULLing are
    map-side on top. No join back, no driver collect."""
    if (k is None) == (k_frac is None):
        raise ValueError("set exactly one of k / k_frac")
    if mode not in ("null", "drop"):
        raise ValueError(f"mode must be 'null' or 'drop', got {mode}")
    if k_frac is not None and not 0.0 < k_frac <= 1.0:
        raise ValueError(f"k_frac must be in (0, 1], got {k_frac}")
    w = Window.partitionBy(*quasi_cols)
    out = df.withColumn("group_n", F.count(F.lit(1)).over(w))
    if k_frac is not None:
        total = df.agg(
            F.count(F.lit(1)).alias("__total")
        )
        out = out.crossJoin(F.broadcast(total)).withColumn(
            "__k",
            F.greatest(
                F.lit(1),
                F.ceil(F.lit(float(k_frac)) * F.col("__total")),
            ),
        ).drop("__total")
    else:
        out = out.withColumn("__k", F.lit(int(k)))
    out = out.withColumn("suppressed", F.col("group_n") < F.col("__k"))
    if mode == "drop":
        return out.filter(~F.col("suppressed")).drop("__k")
    for c in quasi_cols:
        out = out.withColumn(
            c, F.when(~F.col("suppressed"), F.col(c))
        )
    return out.drop("__k")
