"""Distributed EXACT global ranking — and the equi-depth histogram
built on it — without the single-task global window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY is correct and
convenient, but Spark executes it as ONE task holding the whole dataset
(WindowExec warns "Moving all data to a single partition"): a
correctness tool that dies at scale. The scalable exact construction is
the classic two-phase rank:

1. split the value domain into range buckets with a single
   ``width_bucket`` over driver-collected (min, max) literals — bucket
   membership is then a PURE FUNCTION OF THE ROW'S VALUE, never of
   physical placement. This is the load-bearing design point: an
   earlier draft keyed the offsets on ``spark_partition_id()`` after
   ``repartitionByRange``, and AQE's partition coalescing renumbered
   the physical partitions BETWEEN the count job and the rank job,
   silently corrupting ranks at sf0.1 (600 K rows ranked into 546 K
   distinct ranks). Bucket boundaries affect only load balance, never
   rank values. (A second draft assigned quantile buckets via a
   63-literal comparison chain; the resulting expression blew the
   fused join+window stage out of whole-stage codegen and ran 6x
   slower than this one-call form — measured 25.6 s vs 3.9 s for the
   identical result at sf0.1.)
2. count rows per bucket — a #buckets-sized aggregate collected to the
   driver (bounded by a knob, NOT data size — the same bounded-collect
   class as the engine's file manifests);
3. rank within each bucket (row_number partitioned by the bucket —
   every task ranks its own slice in parallel) and add the broadcast
   prefix-sum offset of the buckets below.

Equal leading values always share a bucket (same pure function), so the
tie-break columns order them inside one slice and the result is
bit-identical to the naive global window at ANY partitioning. Equi-width
buckets can be lopsided on heavy-tailed value distributions — the
default 1024 buckets (orders of magnitude above cluster parallelism)
absorbs ordinary skew, and a point mass at one value is hot under ANY
value-derived split, exactly as in a distributed sort; pre-aggregate
duplicates if a single value dominates.

Not in the reference (its sort surface is a driver-side pandas
sort_values, ``scripts/usgs_lidar.py:400-439``); this is engine
infrastructure for the analytics tier (equi-depth statistics, exact
top-percentile cuts) at 100 TB.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_buckets: int = 1024,
) -> DataFrame:
    """Exact 1-based global row_number under the TOTAL order
    ``order_cols`` (ascending), computed with no single-task stage.

    ``order_cols`` must be a total order (include a unique tie-break
    column) — with ties the ranking would depend on physical placement.
    The LEADING order column must be numeric or string, non-null, and
    (if floating) NaN-free — NULL and NaN have no position in a total
    order; both are rejected with a ValueError before any ranking runs.
    Numeric leads split on their min/max directly; string leads split on
    an order-preserving 7-byte-prefix integer key (binary collation).
    Adds ``rank_col``; all input columns pass through.
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    if num_buckets <= 1:
        raise ValueError(f"num_buckets must be > 1, got {num_buckets}")
    first = order_cols[0]
    cols = [F.col(c) for c in order_cols]
    if dict(df.dtypes).get(first) == "string":
        # Order-preserving numeric key for a string leading column: the
        # first 7 UTF-8 BYTES, zero-padded, read as a big-endian
        # integer. UTF-8 byte order equals codepoint order, so the key
        # is monotone under the engines' binary collation (Spark
        # UTF8_BINARY, DuckDB default) even when the 7-byte cut splits
        # a multibyte character — prefix bytes compare first either
        # way. 7 bytes (2^56) stays inside the long domain; strings
        # sharing a 7-byte prefix share a bucket and are split by the
        # full sort below, exactly like numeric ties.
        key = F.expr(
            f"cast(conv(hex(rpad(substring(encode({first}, 'UTF-8'),"
            f" 1, 7), 7, X'00')), 16, 10) as bigint)"
        )
    else:
        key = F.col(first).cast("double")
    # Domain literals: one min/max pass, two scalars on the driver.
    # Exactness does not depend on them — only load balance does.
    mm = df.agg(
        F.min(key.cast("double")).alias("mn"),
        F.max(key.cast("double")).alias("mx"),
        F.count(F.lit(1)).alias("n_rows"),
    ).collect()[0]
    mn, mx = mm["mn"], mm["mx"]
    # min/max ignore NULLs, so mn is None both for EMPTY input and for
    # an all-NULL leading key. Only the former may take the trivial
    # single-bucket branch below; the latter must hit the same loud
    # contract as the partial-NULL case (which the bucket scan catches).
    if mn is None and mm["n_rows"] > 0:
        raise ValueError(
            f"global_rank: leading order column {first!r} contains NULL "
            "or NaN values — the total order is undefined for them; "
            "filter them out or map them to a sentinel first"
        )
    # NaN surfaces HERE, not in the bucket scan: Spark's max orders NaN
    # above every double, so one NaN row makes mx NaN and the repr'd
    # width_bucket literal would be invalid SQL. Same contract as the
    # NULL-bucket guard below: no position in a total order.
    if any(v is not None and math.isnan(v) for v in (mn, mx)):
        raise ValueError(
            f"global_rank: leading order column {first!r} contains NULL "
            "or NaN values — the total order is undefined for them; "
            "filter them out or map them to a sentinel first"
        )
    if mn is None:
        bucket = F.lit(0).cast("long")  # empty input
    else:
        # mx * 1.001 + 1 keeps the top edge exclusive-safe at any
        # magnitude (width_bucket's upper bound is exclusive, and for
        # keys above 2^53 a plain +1 vanishes in double rounding);
        # equal min==max degenerates to one bucket, which is correct,
        # just unparallel. Bucket = monotone pure function of the key,
        # so double rounding of huge keys can only merge neighbors,
        # never reorder them.
        hi = float(mx) * 1.001 + 1.0 if mx >= 0 else float(mx) * 0.999 + 1.0
        bucket = F.expr(
            f"width_bucket(cast(__gr_key as double), {mn!r}, "
            f"{hi!r}, {num_buckets})"
        )
    bdf = df.withColumn("__gr_key", key).withColumn("__b", bucket).drop(
        "__gr_key"
    )
    # Bucket counts: <= num_buckets rows, bounded by the knob.
    rows = (
        bdf.groupBy("__b").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    # A NULL bucket means the leading key was NULL or NaN —
    # width_bucket(NaN/NULL, ...) is NULL, those rows have no place in
    # the total order, and the sort below would otherwise crash on a
    # None-vs-int comparison. Fail loudly with the actual contract.
    if any(r["__b"] is None for r in rows):
        raise ValueError(
            f"global_rank: leading order column {first!r} contains NULL "
            "or NaN values — the total order is undefined for them; "
            "filter them out or map them to a sentinel first"
        )
    pc = sorted((r["__b"], r["cnt"]) for r in rows)
    offsets, acc = [], 0
    for b, cnt in pc:
        offsets.append((b, acc))
        acc += cnt
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets or [], "__b long, __offset long")
    w = Window.partitionBy("__b").orderBy(*cols)
    return (
        bdf.join(F.broadcast(off_df), "__b")
        .withColumn(
            rank_col,
            (F.col("__offset") + F.row_number().over(w)).cast("long"),
        )
        .drop("__b", "__offset")
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


def budget_prefix_select(
    df: DataFrame,
    score_col: str,
    weight_col: str,
    budget: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Budget-constrained greedy selection — "fill a token budget with
    the best-scoring documents": order rows by (score DESC, id ASC) and
    keep the longest prefix whose cumulative ``weight_col`` stays
    within ``budget``. The curation step that turns a scored corpus
    into a fixed-token training set.

    The global ordered prefix-sum is computed WITHOUT a single-task
    window (this module's reason to exist) AND without any data-sized
    driver pull (round 11 — the earlier form collected the per-score
    aggregate and prefix-summed it in Python behind a 100k-distinct-
    score guard; both are gone), in the `global_rank` two-phase shape:

    1. per-SCORE weight totals — a map-combined shuffle bounded by the
       score domain;
    2. the running cumulative weight over scores DESCENDING, two-phase:
       range-bucket each score (bucket = pure function of the VALUE,
       never physical placement — the same AQE-proof construction as
       `global_rank`), collect only the <= ``num_buckets`` per-bucket
       totals, broadcast their descending prefix offsets back, and add
       a within-bucket running-sum window. A score group fits outright
       iff its inclusive cumulative weight stays within budget;
    3. the BOUNDARY score (the best score that does NOT fully fit) and
       the budget remaining before it come from a single 1-row
       ``max_by`` aggregate that rides back on a broadcast; only
       boundary-score rows then flow through a rank window partitioned
       by that single score value (id ASC) where a running weight sum
       decides how many fit. A point mass at the boundary score is hot
       under any value split — the same caveat as any distributed
       sort; pre-aggregate if one score dominates.

    The only driver state is the domain min/max pair and the
    per-bucket totals — bounded by the ``num_buckets`` knob, never by
    data (the `global_rank` bounded-collect class). Any number of
    distinct scores is fine.

    Rows with NULL score or weight are rejected loudly (a silent drop
    would shrink the budget's denominator); a NaN score is rejected the
    same way (no position in a total order — `global_rank`'s contract).
    ``weight_col`` must be an integral type — the running prefix totals
    are exact BIGINTs, so a fractional weight column would be silently
    floored per row (selection accounting diverging from true weights);
    weights in fractional units must be scaled to integers by the
    caller. Returns the kept rows with their original columns.
    Deterministic at any partitioning: the (score, id) order is total.
    """
    from pyspark.sql.types import (
        ByteType,
        DecimalType,
        IntegerType,
        LongType,
        ShortType,
    )

    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    wtype = df.schema[weight_col].dataType
    # DecimalType(p, 0) is an EXACT integral type (decimal-typed
    # warehouses, ADVICE r9): accepted up to p=18, where the cast to
    # BIGINT below is lossless by construction. Wider scale-0 decimals
    # could exceed int64 and are rejected with the real reason.
    integral = isinstance(
        wtype, (ByteType, ShortType, IntegerType, LongType)
    ) or (
        isinstance(wtype, DecimalType)
        and wtype.scale == 0
        and wtype.precision <= 18
    )
    if not integral:
        raise ValueError(
            f"budget_prefix_select: weight column {weight_col!r} has type "
            f"{wtype.simpleString()} — the budget accounting sums exact "
            "BIGINTs and accepts only integral types (byte/short/int/"
            "long, or decimal(p<=18, 0), which casts to BIGINT "
            "losslessly). A fractional type would be silently floored "
            "per row and a wider decimal could overflow int64; scale or "
            "cast weights to integers first"
        )
    s, w = F.col(score_col), F.col(weight_col)
    stype = df.schema[score_col].dataType.simpleString()
    # Non-finite scores are rejected alongside NaN: an Infinity score
    # would make the bucket domain's `hi` literal the bare token `inf`
    # in the width_bucket SQL (UNRESOLVED_COLUMN — a confusing analysis
    # error instead of this contract error), and +/-inf has no usable
    # range-bucket position anyway (every other score collapses into
    # one bucket against an infinite domain width).
    nonfinite = (
        (F.isnan(s) | (F.abs(s) == F.lit(float("inf"))))
        if stype in ("float", "double")
        else F.lit(False)
    )
    bad = df.filter(s.isNull() | nonfinite | w.isNull() | (w < 0))
    if not bad.isEmpty():
        raise ValueError(
            "budget_prefix_select: NULL/NaN/Infinity score, NULL "
            "weight, or negative weight values present — the running "
            "prefix total is only monotone for non-negative weights, "
            "NULL/NaN have no position in a total order, and a "
            "non-finite score breaks the range-bucket domain; filter "
            "or impute first"
        )
    per_score = df.groupBy(s.alias("__s")).agg(
        F.sum(w.cast("long")).alias("__wsum")
    )
    # Phase 1 — range-bucket the score domain (the global_rank key
    # construction: numeric scores split on their value; string scores
    # on the order-preserving 7-byte-prefix integer key).
    if stype == "string":
        key = F.expr(
            "cast(conv(hex(rpad(substring(encode(__s, 'UTF-8'),"
            " 1, 7), 7, X'00')), 16, 10) as bigint)"
        ).cast("double")
    else:
        key = F.col("__s").cast("double")
    num_buckets = 1024
    mm = per_score.agg(
        F.min(key).alias("mn"), F.max(key).alias("mx")
    ).collect()[0]
    mn, mx = mm["mn"], mm["mx"]
    if mn is None:
        return df  # empty input: the kept set is the (empty) input
    hi = float(mx) * 1.001 + 1.0 if mx >= 0 else float(mx) * 0.999 + 1.0
    bdf = per_score.withColumn("__bps_key", key).withColumn(
        "__b",
        F.expr(
            f"width_bucket(cast(__bps_key as double), {mn!r}, "
            f"{hi!r}, {num_buckets})"
        ),
    ).drop("__bps_key")
    # Phase 2 — per-bucket weight totals: <= num_buckets rows on the
    # driver (bounded by the knob, not by data), prefix-summed in
    # DESCENDING bucket order (higher bucket = higher score) and
    # broadcast back as each bucket's above-it offset.
    totals = bdf.groupBy("__b").agg(F.sum("__wsum").alias("ws")).collect()
    offsets, acc = [], 0
    for b, ws in sorted(
        ((r["__b"], r["ws"]) for r in totals), reverse=True
    ):
        offsets.append((b, acc))
        acc += int(ws)
    off_df = df.sparkSession.createDataFrame(
        offsets, "__b long, __off long"
    )
    win_desc = Window.partitionBy("__b").orderBy(F.col("__s").desc())
    cum = (
        bdf.join(F.broadcast(off_df), "__b")
        .withColumn(
            "__cum",
            F.col("__off")
            + F.sum("__wsum").over(
                win_desc.rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
    )
    # Phase 3 — boundary = the BEST score whose inclusive cumulative
    # weight exceeds the budget (everything above it fits outright;
    # everything below it cannot start). One 1-row aggregate: max_by
    # carries the cumulative-before-boundary along, NULL when every
    # score group fits (then the filter below keeps all rows).
    bnd = (
        cum.filter(F.col("__cum") > F.lit(int(budget)))
        .agg(
            F.max("__s").alias("__bs"),
            F.max_by(F.col("__cum") - F.col("__wsum"), F.col("__s")).alias(
                "__before"
            ),
        )
        .select(
            "__bs",
            (F.lit(int(budget)) - F.coalesce("__before", F.lit(0)))
            .cast("long")
            .alias("__rem"),
        )
    )
    withb = df.crossJoin(F.broadcast(bnd))
    fully_in = withb.filter(F.col("__bs").isNull() | (s > F.col("__bs"))).drop(
        "__bs", "__rem"
    )
    edge = withb.filter(s == F.col("__bs"))  # empty when __bs is NULL
    win = Window.partitionBy(s).orderBy(F.col(id_col).asc())
    edge_kept = (
        edge.withColumn(
            "__cum", F.sum(w.cast("long")).over(
                win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        )
        .filter(F.col("__cum") <= F.col("__rem"))
        .drop("__cum", "__bs", "__rem")
    )
    return fully_in.unionByName(edge_kept)
