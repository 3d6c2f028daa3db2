"""The engine's named query surface, oracle-checked query by query.

Every operator in SURVEY.md §2 is exercised by at least one entry here; each
entry has a matching ANSI-SQL oracle that DuckDB runs on the same parquet
(registered views: region nation customer supplier part orders lineitem
events documents embeddings).

Conventions that keep the oracle hash stable (driver compares row count +
schema + order-insensitive value hash, columns sorted by name):
  * every computed column is aliased identically on both sides;
  * double aggregates are ROUND()ed on both sides (sum order differs
    between engines; rounding collapses last-ulp noise);
  * integer-ish results are CAST explicitly (DuckDB's year()/floor()/SUM(int)
    return BIGINT/DOUBLE/HUGEINT where Spark returns INT/LONG/LONG);
  * anything nondeterministic under ties (top-k, row_number) carries a
    unique tie-break key.
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


# =====================================================================
# Flagship — the reference's end-to-end lifecycle re-grounded on the
# synthetic star schema: scan -> noise filter (F1) -> projection (P1)
# -> voxel-grid barycenter aggregation (A1+A2+M2) -> sort (O1).
# Reference: fetch_data + subsample, /root/reference/scripts/
# usgs_lidar.py:312-340, 400-439.
# =====================================================================


@query(
    "flagship_voxel_subsample",
    oracle="""
    WITH pts AS (
        SELECT l_extendedprice AS x, l_quantity AS y, l_discount AS z
        FROM lineitem WHERE l_linenumber <> 7
    ), mins AS (
        SELECT min(x) AS mx, min(y) AS my, min(z) AS mz FROM pts
    )
    SELECT CAST(floor((x - mx) / 1000.0) AS BIGINT) AS ix,
           CAST(floor((y - my) / 5.0)    AS BIGINT) AS iy,
           CAST(floor((z - mz) / 0.02)   AS BIGINT) AS iz,
           CAST(SUM(CAST(ROUND(x * 100) AS BIGINT)) AS DOUBLE)
                 / (100.0 * count(*)) AS cx,
           CAST(SUM(CAST(ROUND(y * 100) AS BIGINT)) AS DOUBLE)
                 / (100.0 * count(*)) AS cy,
           CAST(SUM(CAST(ROUND(z * 100) AS BIGINT)) AS DOUBLE)
                 / (100.0 * count(*)) AS cz,
           count(*) AS n_points
    FROM pts, mins
    GROUP BY 1, 2, 3
    """,
)
def flagship_voxel_subsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Noise-filter + voxel barycenter downsample (the reference flagship).

    lineitem stands in for the point cloud: (x, y, z) =
    (l_extendedprice, l_quantity, l_discount); `l_linenumber <> 7` mirrors
    the LAS class-7 noise filter (/root/reference/pipeline.json:10-14).
    """
    li = _t(spark, sf_dir, "lineitem")
    pts = li.filter(F.col("l_linenumber") != 7).select(
        F.col("l_extendedprice").alias("x"),
        F.col("l_quantity").alias("y"),
        F.col("l_discount").alias("z"),
    )
    return voxel_downsample(
        pts, ["x", "y", "z"], [1000.0, 5.0, 0.02], exact_decimals=[2, 2, 2]
    )


# =====================================================================
# Filters / predicates (SURVEY.md §2 F1, F2)
# =====================================================================


@query(
    "f1_range_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_linenumber <> 7 AND NOT (l_quantity BETWEEN 10 AND 40)
    """,
)
def f1_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/inequality predicate — the `Classification![7:7]` noise filter
    generalized (/root/reference/pipeline.json:10-14). Both predicates are
    pushed to the parquet scan (PushedFilters in .explain)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_linenumber") != 7) & ~F.col("l_quantity").between(10, 40)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "f2_bbox_containment",
    oracle="""
    SELECT p_partkey, p_name, p_size, p_retailprice
    FROM part
    WHERE p_retailprice >= 1200.0 AND p_retailprice <= 1600.0
      AND p_size >= 10 AND p_size <= 40
    """,
)
def f2_bbox_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way AND of theta comparisons — the bbox containment predicate shape
    of fetch_regions (/root/reference/scripts/usgs_lidar.py:297-303)."""
    p = _t(spark, sf_dir, "part")
    return p.filter(
        (F.col("p_retailprice") >= 1200.0)
        & (F.col("p_retailprice") <= 1600.0)
        & (F.col("p_size") >= 10)
        & (F.col("p_size") <= 40)
    ).select("p_partkey", "p_name", "p_size", "p_retailprice")


# =====================================================================
# Joins (SURVEY.md §2 J1, J2, J3)
# =====================================================================


@query(
    "j1_broadcast_lookup",
    oracle="""
    SELECT r_name, n_name, count(*) AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def j1_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog equi-lookup as a BroadcastHashJoin — the reference's per-region
    year lookup (/root/reference/scripts/usgs_lidar.py:326-329) generalized:
    fact joined to two broadcast dimensions."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dec_sum("c_acctbal").alias("total_acctbal"),
        )
    )


@query(
    "j2_theta_containment_join",
    oracle="""
    SELECT s.s_suppkey, count(*) AS n_contained,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_contained_bal
    FROM supplier s JOIN customer c
      ON c.c_acctbal >= s.s_acctbal - 500.0
     AND c.c_acctbal <= s.s_acctbal + 500.0
     AND c.c_nationkey = s.s_nationkey
    GROUP BY s.s_suppkey
    """,
)
def j2_theta_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/theta) join — the generalized polygon-bbox vs
    catalog-bbox containment join (/root/reference/scripts/
    usgs_lidar.py:291-303). The equi-key (nationkey) lets Spark use a real
    hash join with the range as a post-join predicate instead of a pure
    BroadcastNestedLoopJoin — the same trick (grid-cell equi-bucketing)
    scales the spatial version."""
    s = _t(spark, sf_dir, "supplier").alias("s")
    c = _t(spark, sf_dir, "customer").alias("c")
    cond = (
        (F.col("c.c_acctbal") >= F.col("s.s_acctbal") - 500.0)
        & (F.col("c.c_acctbal") <= F.col("s.s_acctbal") + 500.0)
        & (F.col("c.c_nationkey") == F.col("s.s_nationkey"))
    )
    return (
        s.join(c, cond)
        .groupBy("s.s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_contained"),
            dec_sum("c.c_acctbal").alias("sum_contained_bal"),
        )
    )


@query(
    "j3_star_join_agg",
    oracle="""
    SELECT c_mktsegment, o_orderstatus,
           count(*) AS n_lineitems,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment, o_orderstatus
    """,
)
def j3_star_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner-join family over the star schema (fact ⋈ two dims) with a
    partial+final hash aggregate. orders/customer broadcast when under the
    threshold; at 100 TB they'd shuffle-hash-join on the key with AQE."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("long")
                    * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
                )
                / F.lit(10000.0)
            ).alias("revenue"),
        )
    )


@query(
    "j3_left_join_null_label",
    oracle="""
    SELECT c.c_custkey,
           count(o.o_orderkey) AS n_big_orders,
           coalesce(max(o.o_orderstatus), 'not_specified') AS status_label
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
      ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def j3_left_join_null_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + null labeling — the reference's null-year rewrite
    `"nan" -> "Year: not_specified"` (/root/reference/scripts/
    usgs_lidar.py:329-332) expressed as coalesce over join nulls (T5)."""
    c = _t(spark, sf_dir, "customer").alias("c")
    big = (
        _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0).alias("o")
    )
    return (
        c.join(big, F.col("o.o_custkey") == F.col("c.c_custkey"), "left")
        .groupBy("c.c_custkey")
        .agg(
            F.count("o.o_orderkey").alias("n_big_orders"),
            F.coalesce(F.max("o.o_orderstatus"), F.lit("not_specified")).alias(
                "status_label"
            ),
        )
    )


@query(
    "j3_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000.0)
    """,
)
def j3_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "j3_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j3_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# =====================================================================
# Aggregations / grouping (SURVEY.md §2 A1-A4, G1)
# =====================================================================


@query(
    "a1_global_minmax",
    oracle="""
    SELECT min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
           min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
           count(*) AS n_rows
    FROM lineitem
    """,
)
def a1_global_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global min/max (the voxel anchor aggregate, /root/reference/scripts/
    usgs_lidar.py:416). Min/max of stored values — exact, no rounding."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "g1_group_by_year",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           count(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_price
    FROM orders
    GROUP BY 1
    """,
)
def g1_group_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-by-year keyed outputs — the reference's dict[year -> df]
    (/root/reference/scripts/usgs_lidar.py:312-340) as a groupBy('year');
    on disk the same key is write.partitionBy (see sources/writers.py)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum("o_totalprice").alias("total_price"),
    )


# =====================================================================
# Sorts / limits (SURVEY.md §2 O1, O3)
# =====================================================================


@query(
    "o1_sort_nulls_last",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey,
               max(o.o_orderdate) AS last_big_order
        FROM customer c
        LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
          ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    SELECT c_custkey, last_big_order,
           CAST(row_number() OVER (ORDER BY last_big_order ASC NULLS LAST,
                                   c_custkey) AS BIGINT) AS sort_rank
    FROM per_cust
    """,
)
def o1_sort_nulls_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nulls-last ascending sort — the reference's catalog year sort where
    NaN years sort last (/root/reference/scripts/usgs_lidar.py:304, demo
    cell 10). row_number() materializes the global order so the oracle's
    order-insensitive hash still verifies the sort semantics."""
    c = _t(spark, sf_dir, "customer").alias("c")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0).alias("o")
    per_cust = (
        c.join(big, F.col("o.o_custkey") == F.col("c.c_custkey"), "left")
        .groupBy("c.c_custkey")
        .agg(F.max("o.o_orderdate").alias("last_big_order"))
    )
    w = Window.orderBy(F.col("last_big_order").asc_nulls_last(), F.col("c_custkey"))
    return per_cust.select(
        "c_custkey",
        "last_big_order",
        F.row_number().over(w).cast("long").alias("sort_rank"),
    )


@query(
    "o3_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 15
    """,
)
def o3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k = TakeOrderedAndProject: per-partition heap + driver merge of k
    rows, never a global sort. Unique tie-break keys keep it deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(15)
    )


# =====================================================================
# Set ops (SURVEY.md §2 U1, A4)
# =====================================================================


@query(
    "u1_union_all",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_totalprice > 300000.0
    """,
)
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two slices (the distributed form of the reference's
    row-at-a-time append, /root/reference/scripts/usgs_lidar.py:263-271)."""
    o = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .select(*cols)
        .unionByName(o.filter(F.col("o_totalprice") > 300000.0).select(*cols))
    )


@query(
    "u1_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
    """,
)
def u1_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — customers with both a finished and a big order."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
        .intersect(o.filter(F.col("o_totalprice") > 300000.0).select("o_custkey"))
    )


@query(
    "u1_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
    """,
)
def u1_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — `subtract` is Spark's set-difference with
    SQL EXCEPT semantics (distinct rows of left not present in right)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
        .subtract(o.filter(F.col("o_totalprice") > 300000.0).select("o_custkey"))
    )


# =====================================================================
# String / regex functions (SURVEY.md §2 T1-T5)
# =====================================================================


@query(
    "t1_regex_year_extract",
    oracle="""
    WITH named AS (
        SELECT o_orderkey,
               'SURVEY_' || strftime(o_orderdate, '%Y') || '_A' AS filename
        FROM orders
    )
    SELECT o_orderkey, filename,
           CAST(nullif(regexp_extract(filename, '20[0-9][0-9]+', 0), '')
                AS INTEGER) AS survey_year
    FROM named
    """,
)
def t1_regex_year_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: the reference's year regex `20[0-9][0-9]+` over filename-shaped
    strings (/root/reference/scripts/usgs_lidar.py:224-242) — matches 2000/
    2001, NULL for 19xx (the reference returns None on no-match)."""
    from usgs_lidar_spark.functions.strings import extract_year

    o = _t(spark, sf_dir, "orders")
    named = o.select(
        "o_orderkey",
        F.concat(
            F.lit("SURVEY_"), F.date_format("o_orderdate", "yyyy"), F.lit("_A")
        ).alias("filename"),
    )
    return named.select(
        "o_orderkey", "filename", extract_year("filename").alias("survey_year")
    )


@query(
    "t2_strip_chars",
    oracle="""
    SELECT c_custkey,
           translate(c_name, '#', '') AS stripped,
           CAST(coalesce(nullif(regexp_replace(c_name, '^Customer#0*', ''), ''), '0')
                AS BIGINT) AS parsed_key
    FROM customer
    """,
)
def t2_strip_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: character strip (`location.replace('/','')`,
    /root/reference/scripts/usgs_lidar.py:234) via translate, plus a
    regexp_replace parse that must round-trip the customer key."""
    from usgs_lidar_spark.functions.strings import strip_chars

    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        strip_chars("c_name", "#").alias("stripped"),
        F.coalesce(
            F.nullif(F.regexp_replace("c_name", "^Customer#0*", ""), F.lit("")),
            F.lit("0"),
        )
        .cast("long")
        .alias("parsed_key"),
    )


@query(
    "t3_t4_serialization",
    oracle="""
    SELECT s_suppkey,
           printf('POINT(%.2f %.2f)', s_acctbal, CAST(s_suppkey AS DOUBLE)) AS wkt,
           printf('([%.2f, %.2f],[%d, %d])',
                  least(s_acctbal, 0.0), greatest(s_acctbal, 0.0),
                  s_nationkey, s_nationkey + 1) AS bounds
    FROM supplier
    """,
)
def t3_t4_serialization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3/T4: WKT / bounds string serialization
    (/root/reference/scripts/usgs_lidar.py:73-82) via format_string.
    Inputs are exact 2-decimal values so %.2f never hits a rounding edge."""
    s = _t(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.format_string(
            "POINT(%.2f %.2f)", F.col("s_acctbal"), F.col("s_suppkey").cast("double")
        ).alias("wkt"),
        F.format_string(
            "([%.2f, %.2f],[%d, %d])",
            F.least(F.col("s_acctbal"), F.lit(0.0)),
            F.greatest(F.col("s_acctbal"), F.lit(0.0)),
            F.col("s_nationkey"),
            F.col("s_nationkey") + 1,
        ).alias("bounds"),
    )


# =====================================================================
# Math / geo functions (SURVEY.md §2 M1, M2)
# =====================================================================


@query(
    "m1_mercator_reproject",
    oracle="""
    WITH geo AS (
        SELECT c_custkey,
               CAST(c_custkey % 360 AS DOUBLE) - 180.0 + 0.25 AS lon,
               CAST(c_custkey % 170 AS DOUBLE) - 84.5 AS lat
        FROM customer
    )
    SELECT c_custkey,
           ROUND(6378137.0 * radians(lon), 2) AS merc_x,
           ROUND(6378137.0 * ln(tan(pi()/4 + radians(lat)/2)), 2) AS merc_y,
           ROUND(degrees((6378137.0 * radians(lon)) / 6378137.0), 6) AS lon_rt,
           ROUND(degrees(2 * atan(exp((6378137.0 * ln(tan(pi()/4 + radians(lat)/2)))
                 / 6378137.0)) - pi()/2), 6) AS lat_rt
    FROM geo
    """,
)
def m1_mercator_reproject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: closed-form Web-Mercator reprojection (EPSG:4326<->3857) as pure
    column math — the engine's replacement for the reference's pyproj
    `convert_epsg` (/root/reference/scripts/usgs_lidar.py:441-463) and the
    PDAL reprojection stage (pipeline.json:15-20). Forward + roundtrip,
    rounded (cm / micro-degree) to absorb libm-vs-JVM trig ulps."""
    from usgs_lidar_spark.functions import mercator as M

    c = _t(spark, sf_dir, "customer")
    geo = c.select(
        "c_custkey",
        ((F.col("c_custkey") % 360).cast("double") - 180.0 + 0.25).alias("lon"),
        ((F.col("c_custkey") % 170).cast("double") - 84.5).alias("lat"),
    )
    x = M.lon_to_x("lon")
    y = M.lat_to_y("lat")
    return geo.select(
        "c_custkey",
        F.round(x, 2).alias("merc_x"),
        F.round(y, 2).alias("merc_y"),
        F.round(M.x_to_lon(x), 6).alias("lon_rt"),
        F.round(M.y_to_lat(y), 6).alias("lat_rt"),
    )


@query(
    "m2_grid_keys",
    oracle="""
    WITH mn AS (SELECT min(l_extendedprice) AS mp FROM lineitem)
    SELECT CAST(floor((l_extendedprice - mp) / 5000.0) AS BIGINT) AS price_bucket,
           count(*) AS n
    FROM lineitem, mn
    GROUP BY 1
    """,
)
def m2_grid_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: grid-key arithmetic `floor((col - min)/res)`
    (/root/reference/scripts/usgs_lidar.py:416) — histogram form; the global
    min is broadcast, not collected."""
    li = _t(spark, sf_dir, "lineitem")
    mn = li.agg(F.min("l_extendedprice").alias("mp"))
    return (
        li.crossJoin(F.broadcast(mn))
        .groupBy(
            F.floor((F.col("l_extendedprice") - F.col("mp")) / 5000.0)
            .cast("long")
            .alias("price_bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _tmerc_oracle_sql() -> str:
    """DuckDB replay of the Krüger forward series (functions/tmerc.py),
    with hyperbolics spelled via exp/ln (DuckDB has none built in). The
    numeric coefficients are repr()'d from the very constants the Spark
    expressions use, so the two sides compute the same series; cm rounding
    absorbs libm-vs-JVM ulps."""
    from usgs_lidar_spark.functions import tmerc as _TM

    con = repr(_TM._CON)
    a1, a2, a3, a4 = (repr(c) for c in _TM._ALPHA)
    k0a = repr(_TM.UTM_K0 * _TM._A_BAR)

    def atanh(u: str) -> str:
        return f"0.5 * ln((1.0 + ({u})) / (1.0 - ({u})))"

    def sinh(v: str) -> str:
        return f"(exp({v}) - exp(-({v}))) / 2.0"

    def cosh(v: str) -> str:
        return f"(exp({v}) + exp(-({v}))) / 2.0"

    return f"""
    WITH geo AS (
        SELECT c_custkey,
               12.0 + CAST(c_custkey % 600 AS DOUBLE) / 100.0 AS lon,
               CAST(c_custkey % 1680 AS DOUBLE) / 10.0 - 84.0 AS lat
        FROM customer
    ), s1 AS (
        SELECT c_custkey, sin(radians(lat)) AS sphi,
               radians(lon - 15.0) AS dlam
        FROM geo
    ), s2 AS (
        SELECT c_custkey, dlam,
               {atanh("sphi")} - {con} * {atanh(f"{con} * sphi")} AS q
        FROM s1
    ), s3 AS (
        SELECT c_custkey, dlam, {sinh("q")} AS t FROM s2
    ), s4 AS (
        SELECT c_custkey, atan2(t, cos(dlam)) AS xip,
               sin(dlam) / sqrt(1.0 + t * t) AS w
        FROM s3
    ), s5 AS (
        SELECT c_custkey, xip, {atanh("w")} AS etap FROM s4
    ), s6 AS (
        SELECT c_custkey,
               xip + {a1} * sin(2.0 * xip) * {cosh("2.0 * etap")}
                   + {a2} * sin(4.0 * xip) * {cosh("4.0 * etap")}
                   + {a3} * sin(6.0 * xip) * {cosh("6.0 * etap")}
                   + {a4} * sin(8.0 * xip) * {cosh("8.0 * etap")} AS xi,
               etap + {a1} * cos(2.0 * xip) * {sinh("2.0 * etap")}
                    + {a2} * cos(4.0 * xip) * {sinh("4.0 * etap")}
                    + {a3} * cos(6.0 * xip) * {sinh("6.0 * etap")}
                    + {a4} * cos(8.0 * xip) * {sinh("8.0 * etap")} AS eta
        FROM s5
    )
    SELECT c_custkey,
           ROUND(500000.0 + {k0a} * eta, 2) AS easting,
           ROUND({k0a} * xi, 2) AS northing
    FROM s6
    """


@query("m3_utm_reproject", oracle=_tmerc_oracle_sql())
def m3_utm_reproject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3: ellipsoidal transverse Mercator (EPSG:4326 -> 32633) as pure
    column math — the UTM leg of the reference's pyproj `to_crs`
    (/root/reference/scripts/usgs_lidar.py:441-463) without any UDF.
    Synthetic lon/lat spans the full zone-33 band (12..18°E, ±84° lat);
    rounded to cm on both sides. Inverse is pinned at µm by
    tests/test_functions.py::test_tmerc_roundtrip_micrometer."""
    from usgs_lidar_spark.functions import tmerc

    c = _t(spark, sf_dir, "customer")
    geo = c.select(
        "c_custkey",
        (F.lit(12.0) + (F.col("c_custkey") % 600).cast("double") / 100.0).alias(
            "lon"
        ),
        ((F.col("c_custkey") % 1680).cast("double") / 10.0 - 84.0).alias("lat"),
    )
    E, N = tmerc.utm_forward("lon", "lat", 32633)
    return geo.select(
        "c_custkey",
        F.round(E, 2).alias("easting"),
        F.round(N, 2).alias("northing"),
    )


# =====================================================================
# JSON functions (SURVEY.md §2 X1)
# =====================================================================


@query(
    "x1_json_extract",
    oracle="""
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
           count(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
               AS k_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def x1_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: JSON field extraction from the crawled payload
    (/root/reference/scripts/usgs_lidar.py:260-271) — get_json_object over
    the events.props JSON column, then aggregation on the extracted field.
    Also exercises the TIMESTAMP(NANOS) parquet read path end-to-end."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy(
        "event_type", (k % 10).alias("k_mod")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k.cast("long")).alias("k_sum"),
    )


# =====================================================================
# Window functions (SURVEY.md §2 W1)
# =====================================================================


@query(
    "w1_row_number",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS BIGINT)
               AS order_seq
    FROM orders
    """,
)
def w1_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: ranking window — per-customer order sequence (unique tie-break
    key keeps it deterministic)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


@query(
    "w1_lag_lead",
    oracle="""
    SELECT o_orderkey, o_custkey,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_orderstatus) OVER w AS next_status
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
)
def w1_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: lag/lead analytics — pure value passthrough (no arithmetic, so
    doubles compare exactly)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_orderstatus").over(w).alias("next_status"),
    )


@query(
    "w1_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100.0 AS running_total
    FROM orders
    """,
)
def w1_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: running-sum frame. Summed as scaled BIGINTs — window aggregates
    use different accumulation structures per engine (segment trees vs
    streaming), so double sums would drift in the last ulp."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return o.select(
        "o_orderkey",
        "o_custkey",
        (F.sum(cents).over(w) / F.lit(100.0)).alias("running_total"),
    )


@query(
    "w1_rank_dense_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           CAST(rank()       OVER w AS BIGINT) AS qty_rank,
           CAST(dense_rank() OVER w AS BIGINT) AS qty_dense_rank
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)
    """,
)
def w1_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: rank/dense_rank — tie-tolerant ranking (same rank for equal
    quantities, so no tie-break needed)."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.rank().over(w).cast("long").alias("qty_rank"),
        F.dense_rank().over(w).cast("long").alias("qty_dense_rank"),
    )


# =====================================================================
# Event-time windows (SURVEY.md §2 R1) — batch-equivalent forms of the
# Structured Streaming operators in usgs_lidar_spark/streaming/.
# =====================================================================


@query(
    "r1_tumbling_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '10 minutes',
                                date_trunc('microseconds', ts)),
                    '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def r1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1: tumbling event-time window (10 min) — the batch-equivalent of
    `groupBy(window(ts, '10 minutes'))`; the streaming variant with
    watermarking lives in streaming/events.py."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("value_sum"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


@query(
    "r1_sliding_window",
    oracle="""
    WITH e AS (SELECT date_trunc('microseconds', ts) AS ts, value FROM events),
    assigned AS (
        SELECT time_bucket(INTERVAL '10 minutes', ts) AS win_start, value FROM e
        UNION ALL
        SELECT time_bucket(INTERVAL '10 minutes', ts, INTERVAL '5 minutes')
            AS win_start, value FROM e
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
           count(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS value_sum
    FROM assigned
    GROUP BY 1
    """,
)
def r1_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1: sliding window (10 min width, 5 min slide) — each event lands in
    two overlapping windows; the oracle reproduces that with two
    offset-aligned time_buckets."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("value_sum"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n_events",
            "value_sum",
        )
    )


@query(
    "r1_session_window",
    oracle="""
    WITH e AS (
        SELECT user_id, date_trunc('microseconds', ts) AS ts, value FROM events
    ), flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         IS NULL
                     OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL '5 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM e
    ), sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           count(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS value_sum
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def r1_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1: session window (5 min inactivity gap) — Spark's session_window
    vs the classic gaps-and-islands SQL. A new session starts when the gap
    is >= the timeout (Spark sessions span [ts, ts+gap))."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("value_sum"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
            "value_sum",
        )
    )


# =====================================================================
# As-of join (extension; SURVEY.md §2 J3 "as-of")
# =====================================================================


@query(
    "asof_purchase_before_click",
    oracle="""
    WITH e AS (
        SELECT event_id, date_trunc('microseconds', ts) AS ts,
               user_id, event_type, value
        FROM events
    ), c AS (SELECT * FROM e WHERE event_type = 'click'),
       p AS (SELECT * FROM e WHERE event_type = 'purchase')
    SELECT c.event_id AS click_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS asof_ts,
           p.value AS asof_value
    FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_purchase_before_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every click, the user's most recent purchase at or
    before it. Union + running last() — one shuffle, no range explosion
    (see operators/asof.py for the 100 TB design rationale)."""
    from usgs_lidar_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", "event_id"
    )
    joined = asof_join(
        clicks,
        purchases,
        partition_keys=["user_id"],
        ts_col="ts",
        payload_cols=["value"],
        tie_break="event_id",
    )
    return joined.select(
        "click_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("asof_ts"),
        F.col("asof_value"),
    )


# =====================================================================
# Deduplication (north-star extension; SURVEY.md §2 "Extension operators")
# =====================================================================

#: Shared oracle CTE: distinct char-8 shingles per doc, frequency-capped at
#: max_df=20 (the skew guard — see operators/dedup.char_shingles).
_SHINGLE_CTE = """
    sh0 AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, greatest(length(text) - 7, 0) + 1),
                          i -> substr(text, CAST(i AS INTEGER), 8))) AS shingle
            FROM documents)
    ), freq AS (
        SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 20
    ), sh AS (
        SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN freq USING (shingle)
    ), sizes AS (
        SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), jac AS (
        SELECT id_a, id_b, n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
               CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
    )
"""


@query(
    "dedup_exact",
    oracle="""
    SELECT text AS text_key, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on text, min-id representative."""
    from usgs_lidar_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"), "text", "doc_id")


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLE_CTE}
    SELECT id_a, id_b, n_inter, n_a, n_b, jaccard
    FROM jac WHERE jaccard >= 0.6
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (k=8, J>=0.6, df-cap 20):
    shingle-explode -> equi-self-join -> integer intersection counts ->
    one double division (deterministic across engines)."""
    from usgs_lidar_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        k=8, threshold=0.6, max_df=20,
    )


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SHINGLE_CTE}
    SELECT id_a, id_b, jaccard
    FROM jac WHERE jaccard >= 0.6
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection (64 perms, 32 bands x 2 rows,
    candidates verified with exact Jaccard). The oracle is the exact
    Jaccard join: with r=2/b=32 the probability of missing a J>=0.6 pair
    is (1-0.36)^32 ~ 6e-7, and verification removes all false positives,
    so LSH output == exact output on this data. The LSH plan itself never
    compares all pairs — candidates come from the band-hash equi-join."""
    from usgs_lidar_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        k=8, num_perm=64, bands=32, threshold=0.6, max_df=20,
    )


# (dedup_simhash64 retired in round 10: the xxhash64 fingerprint surface
# is covered by `dedup_simhash_portable`, whose two-round-Lehmer hash
# family carries a HARD DuckDB oracle; the xxhash64 kernel itself stays
# exercised by operators/dedup.simhash64's unit tests.)


# =====================================================================
# Text analysis (north-star extension)
# =====================================================================


@query(
    "text_token_stats",
    oracle=r"""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
               AS n_bpe_tokens,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
                     / length(text) END AS punct_ratio
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace + BPE-ish regex tokenizers, punctuation
    ratio. All JVM-side regexp/split expressions; ratios are unrounded
    int/int divisions (bit-deterministic)."""
    from usgs_lidar_spark.functions import textstats as TS

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TS.token_count("text").alias("n_ws_tokens"),
        TS.bpe_token_count("text").alias("n_bpe_tokens"),
        TS.punct_ratio("text").alias("punct_ratio"),
    )


@query(
    "text_quality_score",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, text,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\s+') END AS tokens
        FROM documents
    ), stats AS (
        SELECT doc_id,
               len(tokens) AS n_tokens,
               CASE WHEN len(tokens) = 0 THEN 0.0
                    ELSE CAST(len(list_filter(tokens, t -> list_contains(
                         ['the','and','of','to','in','is','that','it'], t)))
                         AS DOUBLE) / len(tokens) END AS stop_ratio,
               CASE WHEN len(tokens) = 0 THEN 0.0
                    ELSE CAST(list_sum(list_transform(tokens, t -> length(t)))
                         AS DOUBLE) / len(tokens) END AS avg_token_len
        FROM toks
    )
    SELECT doc_id, n_tokens, stop_ratio, avg_token_len,
           (stop_ratio * 0.4) + (least(n_tokens, 100) / 100.0 * 0.3)
               + (least(avg_token_len, 10.0) / 10.0 * 0.3) AS quality
    FROM stats
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, token-length stats, bounded linear
    combination. The score expression is structured identically on both
    sides so double arithmetic is bit-identical."""
    from usgs_lidar_spark.functions import textstats as TS

    d = _t(spark, sf_dir, "documents")
    toks = TS.ws_tokens("text")
    n_tokens = F.size(toks).cast("long")
    stop_ratio = TS.stopword_ratio("text")
    tok_len_sum = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    avg_token_len = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        tok_len_sum.cast("double") / n_tokens
    )
    base = d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        avg_token_len.alias("avg_token_len"),
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "stop_ratio",
        "avg_token_len",
        (
            (F.col("stop_ratio") * 0.4)
            + (F.least(F.col("n_tokens"), F.lit(100)) / 100.0 * 0.3)
            + (F.least(F.col("avg_token_len"), F.lit(10.0)) / 10.0 * 0.3)
        ).alias("quality"),
    )


@query(
    "text_lang_id",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\s+') END AS tokens
        FROM documents
    ), hits AS (
        SELECT doc_id,
            CAST(len(list_filter(tokens, t -> list_contains(['the','and','of','to','in','is','that','it'], t))) AS BIGINT) AS en_hits,
            CAST(len(list_filter(tokens, t -> list_contains(['der','die','und','das','ist','nicht','ein','zu'], t))) AS BIGINT) AS de_hits,
            CAST(len(list_filter(tokens, t -> list_contains(['le','la','et','les','des','est','une','dans'], t))) AS BIGINT) AS fr_hits,
            CAST(len(list_filter(tokens, t -> list_contains(['el','la','de','que','y','los','es','una'], t))) AS BIGINT) AS es_hits
        FROM toks
    )
    SELECT doc_id, en_hits, de_hits, fr_hits, es_hits,
           CASE WHEN en_hits > 0 AND en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
                WHEN de_hits > 0 AND de_hits > en_hits AND de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
                WHEN fr_hits > 0 AND fr_hits > en_hits AND fr_hits > de_hits AND fr_hits >= es_hits THEN 'fr'
                WHEN es_hits > 0 AND es_hits > en_hits AND es_hits > de_hits AND es_hits > fr_hits THEN 'es'
                ELSE 'und' END AS lang_guess
    FROM hits
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: marker-word hit counts per language, argmax
    with fixed priority tie-break (en > de > fr > es), 'und' on zero hits."""
    from usgs_lidar_spark.functions import textstats as TS

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TS.lang_marker_hits("text", "en").alias("en_hits"),
        TS.lang_marker_hits("text", "de").alias("de_hits"),
        TS.lang_marker_hits("text", "fr").alias("fr_hits"),
        TS.lang_marker_hits("text", "es").alias("es_hits"),
        TS.lang_id("text").alias("lang_guess"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           CASE WHEN length(text) < 1 THEN CAST(0 AS BIGINT) ELSE
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, least(length(text), 64) + 1),
                   i -> CAST(ord(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % 1000000007)
           END AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: polynomial rolling hash over the first 64
    chars, h = fold(h*31 + ascii(c)) mod 1e9+7 — higher-order aggregate
    in Spark, list_reduce in the oracle, same fold both sides."""
    from usgs_lidar_spark.functions.textstats import fingerprint

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint("text").alias("fp"))


@query(
    "docs_rollup_cube",
    oracle="""
    SELECT lang, source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY CUBE (lang, source)
    """,
)
def docs_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional rollup: CUBE(lang, source) — grouping-set
    aggregation (the reference's per-year dict generalized to N dims)."""
    d = _t(spark, sf_dir, "documents")
    return d.cube("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


# =====================================================================
# Similarity search (north-star extension)
# =====================================================================

_COSINE_SQL = """
        ROUND(
          list_sum(list_transform(list_zip(c.embedding, q.qv),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(c.embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(q.qv,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS sim
"""


@query(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id, embedding FROM embeddings),
    sims AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
        {_COSINE_SQL}
        FROM c, q WHERE c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, sim,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS BIGINT)
               AS rank
    FROM sims QUALIFY rank <= 5
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast query set x corpus, per-query window
    top-k with deterministic tie-break on (rounded sim, neighbor id)."""
    from usgs_lidar_spark.operators.similarity import cosine_topk_bruteforce

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk_bruteforce(
        emb, queries_df, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", k=5,
    )


@query(
    "sim_topk_lsh",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, embedding,
               CAST((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
                  + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
                  + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
                  + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)
                  + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END)
                  + (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END)
                  + (CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END)
                  + (CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END) AS BIGINT)
                   AS bucket
        FROM embeddings
    ), q AS (SELECT vec_id AS query_id, embedding AS qv, bucket
             FROM b WHERE vec_id < 5),
    c AS (SELECT vec_id, embedding, bucket FROM b),
    sims AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
        {_COSINE_SQL}
        FROM c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, sim,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS BIGINT)
               AS rank
    FROM sims QUALIFY rank <= 5
    """,
)
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via deterministic sign-bit LSH buckets (axis-aligned
    hyperplanes over the first 8 dims): candidates come from the bucket
    equi-join — each probe scans ~1/256 of the corpus at scale."""
    from usgs_lidar_spark.operators.similarity import cosine_topk_lsh

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk_lsh(
        emb, queries_df, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", k=5, n_bits=8,
    )


# =====================================================================
# Multimodal binary columns (north-star extension) — Arrow/mapInPandas
# plumbing with SQL-checkable features.
# =====================================================================


@query(
    "mm_binary_features",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CASE WHEN length(text) = 0 THEN -1
                ELSE ord(substr(text, 1, 1)) END AS head_byte,
           CAST(list_sum(list_transform(range(1, length(text) + 1),
                i -> CAST(ord(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT)))
                % 997 AS BIGINT) AS byte_sum_mod
    FROM documents
    """,
)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction through mapInPandas: documents'
    UTF-8 bytes stand in for media payloads; features (byte length, head
    byte, byte-sum mod 997) are SQL-checkable so the Arrow batch path is
    oracle-verified end-to-end. (Texts here are ASCII, so the oracle's
    per-char ord() equals the UTF-8 byte values.)"""
    from usgs_lidar_spark.multimodal import binary_feature_extract, to_media_table

    d = _t(spark, sf_dir, "documents")
    media = to_media_table(d, "doc_id", "text")
    return binary_feature_extract(media)


@query(
    "mm_frame_sample",
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id, text,
               CAST(octet_length(encode(text)) // 16 AS BIGINT)
                   AS n_frames_total
        FROM documents
    ), idx AS (
        SELECT media_id, text, n_frames_total,
               unnest(range(0, CAST(n_frames_total AS INTEGER), 4)) AS i
        FROM m WHERE n_frames_total > 0
    )
    SELECT media_id, CAST(i AS BIGINT) AS frame_index, n_frames_total,
           hex(encode(substr(text, CAST(i AS INTEGER) * 16 + 1, 16)))
               AS frame_hex
    FROM idx
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary media: every 4th 16-byte frame of each
    payload as its own row — the one-to-many mapInPandas shape of a video
    frame-extraction pass, oracle-checked against substring arithmetic
    (frames rendered as hex so both engines compare strings, not
    engine-specific binary encodings; this DuckDB build has no BLOB
    substring, so the oracle slices the ASCII text and hexes its UTF-8
    encoding — byte-identical to slicing the bytes for ASCII payloads)."""
    from usgs_lidar_spark.multimodal import sample_frames, to_media_table

    d = _t(spark, sf_dir, "documents")
    media = to_media_table(d, "doc_id", "text")
    return sample_frames(media, frame_size=16, every_n=4).select(
        "media_id",
        "frame_index",
        "n_frames_total",
        F.hex("frame").alias("frame_hex"),
    )


@query(
    "mm_resize_thumbnail",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(8 AS INTEGER) AS width,
           CAST(4 AS INTEGER) AS height,
           CAST(32 AS BIGINT) AS n_bytes,
           CASE WHEN length(text) = 0 THEN repeat('00', 32)
                ELSE hex(encode(substr(
                    repeat(text,
                           CAST(ceil(32.0 / length(text)) AS INTEGER)),
                    1, 32)))
           END AS content_hex
    FROM documents
    """,
)
def mm_resize_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The thumbnailing pass (`multimodal/binary_ops.fake_resize_image`
    — the deterministic stand-in sharing the real PIL operator's
    schema, Arrow batch shape, and output-size profile): every payload
    resized to 8x4 = 32 bytes by tiling/truncating its content; empty
    payloads become 32 zero bytes. Output bytes are a pure function of
    input bytes, so DuckDB reproduces the payload itself (hex-rendered
    — both engines compare strings) via repeat+substr arithmetic —
    the mapInPandas plumbing, not just its metadata, is hash-checked.
    Map-only at any scale; output volume tracks target geometry, not
    input size (what makes a thumbnail pass cheap to shuffle
    downstream)."""
    from usgs_lidar_spark.multimodal import fake_resize_image, to_media_table

    d = _t(spark, sf_dir, "documents")
    media = to_media_table(d, "doc_id", "text")
    return fake_resize_image(media, width=8, height=4).select(
        "media_id",
        "width",
        "height",
        "n_bytes",
        F.hex("content").alias("content_hex"),
    )


@query(
    "mm_probe_dims",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 11 = 0 THEN CAST(-1 AS INTEGER)
                ELSE CAST(257 + doc_id % 96 AS INTEGER) END AS width,
           CASE WHEN doc_id % 11 = 0 THEN CAST(-1 AS INTEGER)
                ELSE CAST(257 + n_chars % 96 AS INTEGER) END AS height,
           CASE WHEN doc_id % 11 = 0 THEN CAST(-1 AS INTEGER)
                ELSE CAST(3 AS INTEGER) END AS channels
    FROM documents
    """,
)
def mm_probe_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-only dimension probe (`multimodal/binary_ops.
    probe_image_dims` — the 100 TB first pass: a few dozen leading
    bytes per item inside an Arrow batch, no pixel decode) under a hard
    oracle: each document is wrapped in a REAL GIF87a header whose
    little-endian u16 dimensions encode (257 + doc_id % 96,
    257 + n_chars % 96) using only ASCII-range bytes (lo in 1..96,
    hi = 1 — byte-identical through both engines' UTF-8 encode), so
    the probe must actually PARSE the binary header to recover them;
    every 11th document keeps its raw text instead — an unrecognized
    payload — pinning the (-1, -1, -1) corrupt-input contract in the
    same pass. The oracle recomputes the dimensions arithmetically,
    independent of any byte plumbing."""
    from usgs_lidar_spark.multimodal import probe_image_dims, to_media_table

    d = _t(spark, sf_dir, "documents")
    gif = F.concat(
        F.lit("GIF87a"),
        F.expr("chr(1 + doc_id % 96)"), F.expr("chr(1)"),
        F.expr("chr(1 + n_chars % 96)"), F.expr("chr(1)"),
        F.lit("trailer-bytes"),
    )
    payload = F.when(F.col("doc_id") % 11 == 0, F.col("text")).otherwise(gif)
    media = to_media_table(d.withColumn("text", payload), "doc_id", "text")
    return probe_image_dims(media)


@query(
    "mm_dedup_media",
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id, text FROM documents
        UNION ALL
        -- re-uploads: every 7th item appears again under a new id — the
        -- duplicate-groups case a content dedup must actually collapse.
        SELECT doc_id + 100000 AS media_id, text
        FROM documents WHERE doc_id % 7 = 0
    )
    SELECT min(media_id) AS keeper_id,
           CAST(count(*) AS BIGINT) AS n_copies,
           md5(text) AS content_md5
    FROM m GROUP BY md5(text)
    """,
)
def mm_dedup_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup over BINARY media payloads
    (multimodal/binary_ops.dedup_media_by_content): md5 each payload
    JVM-side, keep the lowest media_id per digest. The media table is
    documents' bytes plus a deterministic re-upload slice (every 7th
    payload appears again under media_id+100000),
    so the query collapses real duplicate groups — keeper = the
    original id, n_copies = 2. Only 16-byte digests + ids shuffle;
    payloads never move (the 100 TB media-dedup design). DuckDB's
    md5(VARCHAR) hashes the UTF-8 bytes — identical hex for the ASCII
    stand-in payloads."""
    from usgs_lidar_spark.multimodal import (
        dedup_media_by_content,
        to_media_table,
    )

    d = _t(spark, sf_dir, "documents")
    base = to_media_table(d, "doc_id", "text")
    reups = to_media_table(
        d.filter(F.col("doc_id") % 7 == 0).withColumn(
            "doc_id", F.col("doc_id") + 100000
        ),
        "doc_id",
        "text",
    )
    return dedup_media_by_content(base.unionAll(reups))


@query(
    "mm_audio_quality_filter",
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id,
               list_transform(range(1, length(text) + 1),
                   i -> CAST(ord(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT)
                        - 128) AS s
        FROM documents
    ), win AS (
        SELECT media_id, s,
               unnest(range(0, len(s), 64)) AS k
        FROM m WHERE len(s) > 0
    ), r AS (
        SELECT media_id,
               sqrt(CAST(list_sum(list_transform(list_slice(s, k + 1, k + 64),
                                                 x -> x * x)) AS DOUBLE)
                    / len(list_slice(s, k + 1, k + 64))) AS rms
        FROM win
    ), agg AS (
        SELECT media_id,
               CAST(count(*) AS BIGINT) AS n_windows,
               CAST(sum(CASE WHEN rms < 44.0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_quiet,
               max(rms) AS max_rms,
               CAST(sum(CASE WHEN rms < 44.0 THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*) AS quiet_ratio
        FROM r GROUP BY media_id
    )
    SELECT media_id, n_windows, n_quiet, max_rms, quiet_ratio
    FROM agg WHERE quiet_ratio <= 0.5
    """,
)
def mm_audio_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio QUALITY-FILTER composition on top of the windowed-RMS
    feature pass (`mm_audio_rms` is the per-window feature table; this
    is the per-media decision): roll the windows up per media_id —
    window count, quiet-window count (rms < 44), max RMS — and KEEP
    only media whose quiet_ratio <= 0.5 (drop mostly-silent clips).
    The rollup shuffles one small row per window (media-keyed, partial
    aggregation applies); quiet_ratio is one int/int division and rms
    doubles are bit-exact (int64 sumsq + IEEE sqrt), so the filter
    decision — not just the features — hashes identically in both
    engines."""
    from usgs_lidar_spark.multimodal import audio_rms_windows, to_media_table

    d = _t(spark, sf_dir, "documents")
    w = audio_rms_windows(to_media_table(d, "doc_id", "text"), window=64)
    agg = w.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.sum((F.col("rms") < 44.0).cast("long")).alias("n_quiet"),
        F.max("rms").alias("max_rms"),
    )
    return agg.withColumn(
        "quiet_ratio", F.col("n_quiet") / F.col("n_windows")
    ).filter(F.col("quiet_ratio") <= 0.5)


# =====================================================================
# Exact point-in-polygon (SURVEY.md §2 F3) — bbox prefilter + pandas UDF
# =====================================================================

#: Convex CCW test polygon in (price, quantity*1000) space.
_PIP_POLYGON = [
    (10000.0, 5000.0),
    (90000.0, 3000.0),
    (100000.0, 30000.0),
    (50000.0, 48000.0),
    (15000.0, 40000.0),
]


def _pip_oracle() -> str:
    from usgs_lidar_spark.operators.spatial import convex_halfplane_sql, polygon_bbox

    minx, miny, maxx, maxy = polygon_bbox(_PIP_POLYGON)
    halfplanes = convex_halfplane_sql(
        _PIP_POLYGON, "l_extendedprice", "l_quantity * 1000.0"
    )
    return f"""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice AS px, l_quantity * 1000.0 AS py
    FROM lineitem
    WHERE l_extendedprice BETWEEN {minx!r} AND {maxx!r}
      AND l_quantity * 1000.0 BETWEEN {miny!r} AND {maxy!r}
      AND {halfplanes}
    """


@query("f3_point_in_polygon", oracle=None)
def f3_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: exact polygon crop — bbox prefilter (pushed to the scan) AND
    Arrow-batched ray-casting pandas UDF, the engine's plan for the
    reference's scan-time WKT crop (/root/reference/pipeline.json:4).
    The oracle is the convex-polygon half-plane test (pure arithmetic);
    the engine runs the general even-odd algorithm — agreeing on every
    non-boundary point."""
    from usgs_lidar_spark.operators.spatial import filter_within_polygon

    li = _t(spark, sf_dir, "lineitem")
    pts = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").alias("px"),
        (F.col("l_quantity") * 1000.0).alias("py"),
    )
    return filter_within_polygon(pts, _PIP_POLYGON, x_col="px", y_col="py")


ORACLE["f3_point_in_polygon"] = _pip_oracle()


# =====================================================================
# Terrain derivatives (SURVEY.md §2 Z1/Z2 — declared in the reference's
# README but never implemented there; defined here over the voxel grid)
# =====================================================================

#: 2D grid CTE shared by the Z1/Z2 oracles: price/quantity voxels with an
#: exact-decimal discount barycenter.
_GRID_CTE = """
    mins AS (SELECT min(l_extendedprice) AS mp, min(l_quantity) AS mq
             FROM lineitem),
    cells AS (
        SELECT CAST(floor((l_extendedprice - mp) / 5000.0) AS BIGINT) AS ix,
               CAST(floor((l_quantity - mq) / 5.0) AS BIGINT) AS iy,
               CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE)
                   / (100.0 * count(*)) AS cz
        FROM lineitem, mins GROUP BY 1, 2
    ),
    offs AS (SELECT dx, dy FROM (SELECT unnest([-1, 0, 1]) AS dx) a,
                                 (SELECT unnest([-1, 0, 1]) AS dy) b),
    long AS (SELECT c.ix + o.dx AS tix, c.iy + o.dy AS tiy,
                    -o.dx AS dx, -o.dy AS dy, c.cz AS v
             FROM cells c, offs o),
    piv AS (
        SELECT tix AS ix, tiy AS iy,
               {pivots}
        FROM long GROUP BY 1, 2
    ),
    realc AS (SELECT * FROM piv WHERE v_00 IS NOT NULL)
"""


def _slot_name(dx: int, dy: int) -> str:
    return (
        "v_"
        + ("m" if dx < 0 else "p" if dx > 0 else "0")
        + ("m" if dy < 0 else "p" if dy > 0 else "0")
    )


def _grid_cte() -> str:
    pivots = ",\n               ".join(
        f"MAX(CASE WHEN dx = {dx} AND dy = {dy} THEN v END) AS {_slot_name(dx, dy)}"
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    )
    return _GRID_CTE.format(pivots=pivots)


def _idw_oracle() -> str:
    # Same float literals and addition order as operators/terrain.idw_regrid.
    num_terms, den_terms = [], []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            s = _slot_name(dx, dy)
            w = 1.0 / (1.0 + dx * dx + dy * dy)
            num_terms.append(
                f"(CASE WHEN {s} IS NOT NULL THEN {s} * {w!r} ELSE 0.0 END)"
            )
            den_terms.append(
                f"(CASE WHEN {s} IS NOT NULL THEN {w!r} ELSE 0.0 END)"
            )
    num = " + ".join(num_terms)
    den = " + ".join(den_terms)
    return f"""
    WITH {_grid_cte()}
    SELECT ix, iy, (0.0 + {num}) / (0.0 + {den}) AS idw_value
    FROM realc
    """


def _twi_oracle() -> str:
    higher = " + ".join(
        f"(CASE WHEN {_slot_name(dx, dy)} > v_00 THEN 1 ELSE 0 END)"
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        if (dx, dy) != (0, 0)
    )
    return f"""
    WITH {_grid_cte()}
    SELECT ix, iy,
           sqrt(((v_p0 - v_m0) / 2.0) * ((v_p0 - v_m0) / 2.0)
              + ((v_0p - v_0m) / 2.0) * ((v_0p - v_0m) / 2.0)) AS tan_beta,
           CAST(1 + ({higher}) AS DOUBLE) * 1.0 AS contrib,
           ln((CAST(1 + ({higher}) AS DOUBLE) * 1.0)
              / greatest(sqrt(((v_p0 - v_m0) / 2.0) * ((v_p0 - v_m0) / 2.0)
                            + ((v_0p - v_0m) / 2.0) * ((v_0p - v_0m) / 2.0)),
                         1e-06)) AS twi
    FROM realc
    WHERE v_m0 IS NOT NULL AND v_p0 IS NOT NULL
      AND v_0m IS NOT NULL AND v_0p IS NOT NULL
    """


def _price_qty_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    mins = li.agg(
        F.min("l_extendedprice").alias("mp"), F.min("l_quantity").alias("mq")
    )
    return (
        li.crossJoin(F.broadcast(mins))
        .groupBy(
            F.floor((F.col("l_extendedprice") - F.col("mp")) / 5000.0)
            .cast("long")
            .alias("ix"),
            F.floor((F.col("l_quantity") - F.col("mq")) / 5.0)
            .cast("long")
            .alias("iy"),
        )
        .agg(dec_avg("l_discount").alias("cz"))
    )


@query("z2_idw_regrid", oracle=None)
def z2_idw_regrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z2: IDW interpolation-to-grid (the reference's README.md:45-54
    promise) — 3x3 inverse-distance smoothing of the voxel barycenter
    grid via the neighbor-offer explode (no non-equi join; see
    operators/terrain.py)."""
    from usgs_lidar_spark.operators.terrain import idw_regrid

    return idw_regrid(_price_qty_grid(spark, sf_dir))


ORACLE["z2_idw_regrid"] = _idw_oracle()


@query("z1_twi_grid", oracle=None)
def z1_twi_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z1: Topographic Wetness Index ln(a / tan beta) (the reference's
    README.md:43-44 promise) — central-difference slope + one-hop
    contributing-area proxy over the voxel grid."""
    from usgs_lidar_spark.operators.terrain import twi_grid

    return twi_grid(_price_qty_grid(spark, sf_dir))


ORACLE["z1_twi_grid"] = _twi_oracle()


# =====================================================================
# Additional aggregation surface: vocabulary stats, ROLLUP, percentiles
# =====================================================================


@query(
    "text_vocab_by_lang",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(trim(text), '\s+')) AS token
        FROM documents WHERE trim(text) <> ''
    )
    SELECT lang,
           count(DISTINCT doc_id) AS n_docs,
           count(DISTINCT token) AS vocab_size,
           count(*) AS total_tokens
    FROM tok GROUP BY lang
    """,
)
def text_vocab_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary statistics per language tag: explode tokens -> exact
    distinct counts. (approx_count_distinct is the scale path but HLL
    sketches differ across engines, so the oracled form is exact.)"""
    from usgs_lidar_spark.functions.textstats import ws_tokens

    d = _t(spark, sf_dir, "documents")
    tok = (
        d.filter(F.trim("text") != "")
        .select("doc_id", "lang", F.explode(ws_tokens("text")).alias("token"))
    )
    return tok.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.countDistinct("token").alias("vocab_size"),
        F.count(F.lit(1)).alias("total_tokens"),
    )


@query(
    "g1_rollup_year_status",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           o_orderstatus,
           count(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_price
    FROM orders
    GROUP BY ROLLUP (order_year, o_orderstatus)
    """,
)
def g1_rollup_year_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP(year, status): per-status, per-year, and grand
    totals in one pass (grouping sets)."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup(
        F.year("o_orderdate").alias("order_year"), F.col("o_orderstatus")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum("o_totalprice").alias("total_price"),
    )


@query(
    "a5_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a5_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines implement the standard
    linear-interpolation quantile, so values match bit-for-bit on the
    quarter-step quantity column). percentile_approx is the 100 TB path;
    its sketch is engine-specific, so the oracled form is exact."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# =====================================================================
# Sketch path (rows-only): the 100 TB forms of distinct-count and
# quantiles. Sketch internals are engine-specific, so these get the
# driver's weaker rows-only check; their exact twins (text_vocab_by_lang,
# a5_percentiles) are fully oracled.
# =====================================================================


@query("sketch_approx_stats")
def sketch_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) + percentile_approx
    (KLL-style) per event type — constant-memory per group at any scale,
    which is what replaces the exact forms at 100 TB."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", 0.5).alias("approx_median_value"),
        F.count(F.lit(1)).alias("n"),
    )


# =====================================================================
# Classic TPC-H-shaped analytics (the star-schema capability in its
# canonical form; all money math via exact scaled integers)
# =====================================================================


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_base_price,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                AS DOUBLE) / 10000.0 AS sum_disc_price,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                    * (100 + CAST(ROUND(l_tax * 100) AS BIGINT)))
                AS DOUBLE) / 1000000.0 AS sum_charge,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE)
               / (100.0 * count(*)) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the pricing summary report — one wide partial+final
    hash aggregate over the fact table, date predicate pushed to the scan."""
    li = _t(spark, sf_dir, "lineitem")
    cents_price = F.round(F.col("l_extendedprice") * 100).cast("long")
    cents_disc = F.round(F.col("l_discount") * 100).cast("long")
    cents_tax = F.round(F.col("l_tax") * 100).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            (F.sum(cents_price * (F.lit(100) - cents_disc)) / F.lit(10000.0)).alias(
                "sum_disc_price"
            ),
            (
                F.sum(cents_price * (F.lit(100) - cents_disc) * (F.lit(100) + cents_tax))
                / F.lit(1000000.0)
            ).alias("sum_charge"),
            dec_avg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                AS DOUBLE) / 10000.0 AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> star join -> aggregate ->
    top-k (TakeOrderedAndProject; tie-broken deterministically)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp_ntz")
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            (F.sum(cents * (F.lit(100) - disc)) / F.lit(10000.0)).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                AS DOUBLE) / 10000.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-way star join with a same-nation co-location
    predicate; dims broadcast, fact shuffles once."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg((F.sum(cents * (F.lit(100) - disc)) / F.lit(10000.0)).alias("revenue"))
    )


@query(
    "scalar_subquery_above_avg",
    oracle="""
    WITH g AS (
        SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / (100.0 * count(*)) AS avg_bal
        FROM customer
    )
    SELECT c_custkey, c_acctbal FROM customer, g
    WHERE c_acctbal > avg_bal
    """,
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery comparison (customers above the mean balance) — the
    1-row aggregate is broadcast, never collected; the mean is the exact
    integer-sum form so both engines compare against the same double."""
    c = _t(spark, sf_dir, "customer")
    g = c.agg(dec_avg("c_acctbal").alias("avg_bal"))
    return (
        c.crossJoin(F.broadcast(g))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", "c_acctbal")
    )


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH c AS (SELECT vec_id, embedding FROM embeddings),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(
                 list_sum(list_transform(list_zip(a.embedding, b.embedding),
                          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(a.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(b.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)
                   AS cos_sim
        FROM c a JOIN c b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.45
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= 0.45; the synthetic embeddings max out at ~0.51 pairwise) — the semantic
    dedup flavor. Exact all-pairs here (oracle-checkable); the scale path
    buckets both sides with sign-LSH first (see similarity.cosine_topk_lsh)
    so only same-bucket pairs are compared."""
    from usgs_lidar_spark.functions.vectors import cosine

    emb = _t(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("__va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("__vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine("__va", "__vb"), 4))
        .filter(F.col("cos_sim") >= 0.45)
        .select("id_a", "id_b", "cos_sim")
    )


@query(
    "correlated_above_nation_avg",
    oracle="""
    WITH nav AS (
        SELECT c_nationkey,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / (100.0 * count(*)) AS nation_avg
        FROM customer GROUP BY c_nationkey
    )
    SELECT c.c_custkey, c.c_nationkey, c.c_acctbal, nav.nation_avg
    FROM customer c JOIN nav ON c.c_nationkey = nav.c_nationkey
    WHERE c.c_acctbal > nav.nation_avg
    """,
)
def correlated_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape (customers above their own nation's mean
    balance) — decorrelated into a grouped aggregate + equi-join, the
    rewrite Catalyst itself applies to correlated scalar subqueries."""
    c = _t(spark, sf_dir, "customer")
    nav = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        dec_avg("c_acctbal").alias("nation_avg")
    )
    return (
        c.join(F.broadcast(nav), c.c_nationkey == F.col("nk"))
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_nationkey", "c_acctbal", "nation_avg")
    )


@query(
    "date_trunc_month_rollup",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           o_orderpriority,
           count(*) AS n_orders
    FROM orders
    GROUP BY 1, 2
    """,
)
def date_trunc_month_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar truncation (date_trunc to month) + grouped counts — the
    date-function surface beyond year()."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "order_month"
        ),
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).alias("n_orders"))


# =====================================================================
# Remaining relational surface: full outer join, conditional aggregation,
# HAVING, pivot, array functions
# =====================================================================


@query(
    "j3_full_outer",
    oracle="""
    WITH big_cust AS (
        SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000.0
    ), big_ord AS (
        SELECT o_custkey, count(*) AS n_big
        FROM orders WHERE o_totalprice > 400000.0 GROUP BY o_custkey
    )
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           c.c_acctbal, o.n_big
    FROM big_cust c FULL OUTER JOIN big_ord o ON c.c_custkey = o.o_custkey
    """,
)
def j3_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — both-sides-preserved merge of two filtered sets
    (rich customers vs customers with big orders), nulls on either side."""
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000.0)
        .select("c_custkey", "c_acctbal")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000.0)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full_outer").select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_acctbal",
        "n_big",
    )


@query(
    "a6_conditional_agg",
    oracle="""
    SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           CAST(SUM(CASE WHEN l_returnflag = 'R'
                    THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    ELSE 0 END) AS DOUBLE) / 100.0 AS returned_revenue,
           count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned,
           count(*) AS n_total
    FROM lineitem
    GROUP BY 1
    """,
)
def a6_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (TPC-H Q14 shape): CASE inside SUM/COUNT —
    one pass computing a filtered metric alongside the total."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    is_r = F.col("l_returnflag") == "R"
    return li.groupBy(F.year("l_shipdate").alias("ship_year")).agg(
        (F.sum(F.when(is_r, cents).otherwise(F.lit(0))) / F.lit(100.0)).alias(
            "returned_revenue"
        ),
        F.count(F.when(is_r, F.lit(1))).alias("n_returned"),
        F.count(F.lit(1)).alias("n_total"),
    )


@query(
    "having_large_volume",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) > 250000000
    """,
)
def having_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING clause (TPC-H Q18 shape): post-aggregation predicate on the
    exact integer sum (threshold 2.5M in currency units)."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("__cents"),
        )
        .filter(F.col("__cents") > 250000000)
        .select(
            "o_custkey",
            "n_orders",
            (F.col("__cents") / F.lit(100.0)).alias("total_spent"),
        )
    )


@query(
    "pivot_status_by_segment",
    oracle="""
    SELECT c_mktsegment,
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_F,
           count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_O,
           count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_P
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order-status counts spread to columns per market segment
    (Spark's pivot with explicit values compiles to the same conditional
    aggregation as the oracle)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "c_mktsegment",
            F.coalesce("F", F.lit(0)).alias("status_F"),
            F.coalesce("O", F.lit(0)).alias("status_O"),
            F.coalesce("P", F.lit(0)).alias("status_P"),
        )
    )


@query(
    "array_ops_tokens",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\s+') END AS tokens
        FROM documents
    )
    SELECT doc_id,
           len(list_distinct(tokens)) AS n_distinct_tokens,
           array_to_string(list_sort(list_distinct(tokens))[1:3], ',')
               AS first3_sorted,
           CASE WHEN len(tokens) > 0
                THEN list_sort(tokens)[len(tokens)] ELSE NULL END AS max_token
    FROM toks
    """,
)
def array_ops_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface: distinct/sort/slice/join over token arrays
    (array_distinct, sort_array, slice, array_join, array_max)."""
    from usgs_lidar_spark.functions.textstats import ws_tokens

    d = _t(spark, sf_dir, "documents")
    toks = ws_tokens("text")
    distinct_sorted = F.sort_array(F.array_distinct(toks))
    return d.select(
        "doc_id",
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.array_join(F.slice(distinct_sorted, 1, 3), ",").alias("first3_sorted"),
        F.array_max(toks).alias("max_token"),
    )


# =====================================================================
# Round-2 additions: hash-first exact dedup, SimHash Hamming join,
# multi-probe ANN, salted skew aggregation.
# =====================================================================


@query(
    "dedup_exact_hashed",
    oracle="""
    SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
           CAST(1 AS BIGINT) AS n_variants
    FROM documents GROUP BY text
    """,
)
def dedup_exact_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-first exact dedup: the shuffle carries (hash, hash, id), never
    the text. The oracle groups by the text itself and emits a literal
    n_variants=1 — so a primary-hash collision (which would merge two
    texts and raise Spark's count_distinct(h2) above 1) hash-mismatches."""
    from usgs_lidar_spark.operators.dedup import exact_dedup_hashed

    return exact_dedup_hashed(_t(spark, sf_dir, "documents"), "text", "doc_id")


# (dedup_simhash_near retired in round 10: superseded by
# `dedup_simhash_portable_pairs`, the same pigeonhole block join +
# popcount verify under a HARD all-pairs-Hamming oracle; the xxhash64
# pair path keeps `test_simhash_near_dup_blocked_equals_bruteforce`.)


@query(
    "sim_topk_lsh_multiprobe",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, embedding,
               CAST((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
                  + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
                  + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
                  + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)
                  + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END)
                  + (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END)
                  + (CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END)
                  + (CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END) AS BIGINT)
                   AS bucket
        FROM embeddings
    ), q AS (SELECT vec_id AS query_id, embedding AS qv, bucket
             FROM b WHERE vec_id < 5),
    c AS (SELECT vec_id, embedding, bucket FROM b),
    sims AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
        {_COSINE_SQL}
        FROM c JOIN q ON bit_count(xor(c.bucket, q.bucket)) <= 1
                     AND c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, sim,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS BIGINT)
               AS rank
    FROM sims QUALIFY rank <= 5
    """,
)
def sim_topk_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe ANN: each query probes its sign-LSH bucket plus all
    1-bit-flip neighbors (Hamming<=1 complete). The oracle joins on
    bit_count(xor(bucket_a, bucket_b)) <= 1 — exactly the probe set."""
    from usgs_lidar_spark.operators.similarity import cosine_topk_lsh_multiprobe

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk_lsh_multiprobe(
        emb, queries_df, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", k=5, n_bits=8,
    )


def _cos4(a: str, b: str) -> str:
    """DuckDB rounded-cosine expression between two list operands."""
    return f"""ROUND(
          list_sum(list_transform(list_zip({a}, {b}),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform({a},
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform({b},
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)"""


@query(
    "sim_topk_ivf",
    oracle=f"""
    WITH cent AS (
        SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8
    ), csim AS (
        SELECT e.vec_id, e.embedding, c.cid,
               {_cos4("e.embedding", "c.cvec")} AS csim
        FROM embeddings e CROSS JOIN cent c
    ), assigned AS (
        SELECT vec_id, embedding, cid FROM (
            SELECT vec_id, embedding, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid) AS rn
            FROM csim) WHERE rn = 1
    ), probes AS (
        SELECT vec_id AS query_id, embedding AS qv, cid FROM (
            SELECT vec_id, embedding, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid) AS rn
            FROM csim WHERE vec_id < 5) WHERE rn <= 2
    ), sims AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               {_cos4("a.embedding", "p.qv")} AS sim
        FROM assigned a JOIN probes p
          ON a.cid = p.cid AND a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, sim,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS BIGINT)
               AS rank
    FROM sims QUALIFY rank <= 5
    """,
)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k: 8 coarse cells seeded from the first corpus vectors
    (a deterministic quantizer the oracle can reproduce), corpus assigned
    to cells by a literal-expression argmax (no shuffle), queries probe
    their 2 nearest cells. The oracle replays assignment + probing with
    window argmax over the same rounded cosines."""
    from usgs_lidar_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    # `or` placeholder: on an EMPTY corpus there are no seeds; a 1-dim
    # zero centroid lets the plan still build (nothing executes over an
    # empty scan), so the query returns an empty frame with the correct
    # schema instead of an AnalysisException.
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    ] or [(0, [0.0])]
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(
        emb, queries_df, cents, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", k=5, n_probe=2,
    )


@query(
    "sim_ivf_append_parity",
    oracle=f"""
    WITH cent AS (
        SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8
    ), csim AS (
        SELECT e.vec_id, c.cid, {_cos4("e.embedding", "c.cvec")} AS csim
        FROM embeddings e CROSS JOIN cent c
    )
    SELECT vec_id, cid, csim FROM (
        SELECT vec_id, cid, csim,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rn
        FROM csim) WHERE rn = 1
    """,
)
def sim_ivf_append_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance: assign the first 400 vectors, then
    APPEND the remaining 100 through ivf_append (assign-only, no k-means
    re-run, base untouched). The oracle assigns the WHOLE corpus from
    scratch with the same quantizer — the append path must be
    indistinguishable from a full re-assign (same cells, same
    quantization cosines), which is exactly the invariant that makes
    incremental appends safe on a streaming corpus."""
    from usgs_lidar_spark.operators.similarity import ivf_append, ivf_assign

    emb = _t(spark, sf_dir, "embeddings")
    # `or` placeholder: on an EMPTY corpus there are no seeds; a 1-dim
    # zero centroid lets the plan still build (nothing executes over an
    # empty scan), so the query returns an empty frame with the correct
    # schema instead of an AnalysisException.
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    ] or [(0, [0.0])]
    base = ivf_assign(
        emb.filter(F.col("vec_id") < 400), cents, keep_sim=True
    )
    appended = ivf_append(base, emb.filter(F.col("vec_id") >= 400), cents)
    return appended.select(
        "vec_id", F.col("__cid").alias("cid"), F.col("__csim").alias("csim")
    )


@query(
    "sim_ivf_drift",
    oracle="""
    WITH qe AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))
                   AS qv
        FROM embeddings
    ), cold AS (
        SELECT vec_id AS cid, qv AS qc,
               CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS nq
        FROM qe WHERE vec_id < 8
    ), cnew AS (
        SELECT vec_id AS cid, qv AS qc,
               CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS nq
        FROM qe WHERE vec_id >= 8 AND vec_id < 16
    ), dold AS (
        SELECT e.vec_id, c.cid, c.nq,
               CAST(list_sum(list_transform(list_zip(e.qv, c.qc),
                                            p -> p[1] * p[2])) AS BIGINT)
                   AS qdot
        FROM qe e CROSS JOIN cold c
    ), aold AS (
        SELECT vec_id, cid, qdot FROM (
            SELECT vec_id, cid, qdot,
                   row_number() OVER (PARTITION BY vec_id
                       ORDER BY CASE WHEN nq = 0 THEN 0.0
                                ELSE CAST(qdot AS DOUBLE)
                                     / sqrt(CAST(nq AS DOUBLE)) END DESC,
                                cid) AS rn
            FROM dold) WHERE rn = 1
    ), dnew AS (
        SELECT e.vec_id, c.cid, c.nq,
               CAST(list_sum(list_transform(list_zip(e.qv, c.qc),
                                            p -> p[1] * p[2])) AS BIGINT)
                   AS qdot
        FROM qe e CROSS JOIN cnew c
    ), anew AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                       ORDER BY CASE WHEN nq = 0 THEN 0.0
                                ELSE CAST(qdot AS DOUBLE)
                                     / sqrt(CAST(nq AS DOUBLE)) END DESC,
                                cid) AS rn
            FROM dnew) WHERE rn = 1
    )
    SELECT aold.cid, count(*) AS n,
           CAST(SUM(aold.qdot) AS BIGINT) AS sum_qdot,
           CAST(SUM(CASE WHEN anew.cid <> aold.cid THEN 1 ELSE 0 END)
                AS BIGINT) AS n_moved
    FROM aold JOIN anew USING (vec_id)
    GROUP BY aold.cid
    """,
)
def sim_ivf_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebuild-decision metrics for an incrementally-maintained IVF
    index: per current cell, occupancy, the exact integer sum of
    quantized dots-to-centroid, and how many vectors a candidate
    quantizer (a disjoint seed set, deterministically reproducible by
    the oracle; in production a kmeans_refine output) would reassign.

    Uses `ivf_drift_metrics_exact`: the float form's summed
    ROUND(cos, 4) was driver-red for two rounds (a last-ulp environment
    difference in ANY corpus dot product flips a half-way decimal
    rounding and shifts the sum) — this form quantizes vectors with
    floor(x·2^20) (power-of-two multiply + floor: NO rounding decision
    exists anywhere), so every output column is exact BIGINT arithmetic
    and the cross-engine hash is stable by construction. Both
    assignments ride one scan; shuffle is one row per cell."""
    from usgs_lidar_spark.operators.similarity import ivf_drift_metrics_exact

    emb = _t(spark, sf_dir, "embeddings")

    def seeds(lo: int, hi: int):
        return [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in emb.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
            )
            .select("vec_id", "embedding")
            .collect()
        ] or [(lo, [0.0])]  # empty-corpus placeholder (see sim_topk_ivf)

    return ivf_drift_metrics_exact(emb, seeds(0, 8), seeds(8, 16))


@query(
    "dedup_cluster_collapse",
    oracle=f"""
    WITH RECURSIVE {_SHINGLE_CTE},
    pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.6),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b AS u, id_a AS v FROM pairs),
    walk(id, reach) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT w.id, e.v FROM walk w JOIN edges e ON e.u = w.reach
    ),
    cc AS (SELECT id AS doc_id, min(reach) AS cluster_id FROM walk GROUP BY id),
    csize AS (SELECT cluster_id, count(*) AS cluster_size
              FROM cc GROUP BY cluster_id)
    SELECT cc.doc_id, cc.cluster_id, csize.cluster_size,
           cc.doc_id = cc.cluster_id AS is_kept
    FROM cc JOIN csize USING (cluster_id)
    """,
)
def dedup_cluster_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster collapse over the MinHash near-dup pair graph: connected
    components by iterative min-label propagation (operators/graph.py),
    every document labeled with its cluster representative and size.
    The oracle computes the same components with a recursive CTE
    (transitive closure + min reachable id) — feasible because the
    sf0.01 pair graph is small; the Spark side is the scale path."""
    from usgs_lidar_spark.operators.dedup import minhash_lsh_pairs
    from usgs_lidar_spark.operators.graph import collapse_clusters

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        d, "text", "doc_id", k=8, num_perm=64, bands=32,
        threshold=0.6, max_df=20,
    )
    return collapse_clusters(d, pairs, id_col="doc_id")


@query(
    "skew_salted_count_distinct",
    oracle="""
    SELECT lang, CAST(count(DISTINCT source) AS BIGINT) AS n_distinct
    FROM documents GROUP BY lang
    """,
)
def skew_salted_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe exact COUNT(DISTINCT source) per lang: the distinct set
    of a hot key is hash-spread over 16 salt buckets, each bucket counts
    its disjoint slice, and the per-key sum of bucket counts is exact
    (operators/skew.py salted_count_distinct). The oracle is the plain
    COUNT(DISTINCT) — salting must not change the answer."""
    from usgs_lidar_spark.operators.skew import salted_count_distinct

    return salted_count_distinct(
        _t(spark, sf_dir, "documents"), ["lang"], "source", salt_buckets=16
    )


# =====================================================================
# ANN accuracy metric (round-4 item): recall@k of the approximate
# similarity paths against the exact brute-force baseline. An accuracy
# regression in probe logic (multiprobe neighbor set, IVF probe count)
# now reaches the hard oracle signal, not just plan/unit tests.
# =====================================================================

_LSH_BUCKET_SQL = """CAST((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
                  + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
                  + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
                  + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)
                  + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END)
                  + (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END)
                  + (CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END)
                  + (CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END) AS BIGINT)"""


@query(
    "sim_recall_at_k",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, embedding, {_LSH_BUCKET_SQL} AS bucket FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, embedding AS qv, bucket
        FROM base WHERE vec_id < 5
    ), exact AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.query_id
                       ORDER BY {_cos4("c.embedding", "q.qv")} DESC, c.vec_id)
                       AS rank
            FROM base c, q WHERE c.vec_id <> q.query_id
        ) WHERE rank <= 5
    ), mp AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.query_id
                       ORDER BY {_cos4("c.embedding", "q.qv")} DESC, c.vec_id)
                       AS rank
            FROM base c JOIN q ON bit_count(xor(c.bucket, q.bucket)) <= 1
                              AND c.vec_id <> q.query_id
        ) WHERE rank <= 5
    ), cent AS (
        SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8
    ), csim AS (
        SELECT e.vec_id, e.embedding, c.cid,
               {_cos4("e.embedding", "c.cvec")} AS csim
        FROM embeddings e CROSS JOIN cent c
    ), assigned AS (
        SELECT vec_id, embedding, cid FROM (
            SELECT vec_id, embedding, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid) AS rn
            FROM csim) WHERE rn = 1
    ), probes AS (
        SELECT vec_id AS query_id, embedding AS qv, cid FROM (
            SELECT vec_id, embedding, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid) AS rn
            FROM csim WHERE vec_id < 5) WHERE rn <= 2
    ), ivf AS (
        SELECT query_id, neighbor_id FROM (
            SELECT p.query_id, a.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY p.query_id
                       ORDER BY {_cos4("a.embedding", "p.qv")} DESC, a.vec_id)
                       AS rank
            FROM assigned a JOIN probes p
              ON a.cid = p.cid AND a.vec_id <> p.query_id
        ) WHERE rank <= 5
    ), nex AS (
        SELECT query_id, count(*) AS n_exact FROM exact GROUP BY query_id
    ), mph AS (
        SELECT e.query_id, count(*) AS n_hit
        FROM exact e JOIN mp m
          ON e.query_id = m.query_id AND e.neighbor_id = m.neighbor_id
        GROUP BY e.query_id
    ), ivfh AS (
        SELECT e.query_id, count(*) AS n_hit
        FROM exact e JOIN ivf i
          ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
        GROUP BY e.query_id
    )
    SELECT 'lsh_multiprobe' AS method, nex.query_id,
           CAST(COALESCE(mph.n_hit, 0) AS BIGINT) AS n_hit,
           CAST(nex.n_exact AS BIGINT) AS n_exact,
           CAST(COALESCE(mph.n_hit, 0) AS DOUBLE) / nex.n_exact AS recall
    FROM nex LEFT JOIN mph USING (query_id)
    UNION ALL
    SELECT 'ivf' AS method, nex.query_id,
           CAST(COALESCE(ivfh.n_hit, 0) AS BIGINT) AS n_hit,
           CAST(nex.n_exact AS BIGINT) AS n_exact,
           CAST(COALESCE(ivfh.n_hit, 0) AS DOUBLE) / nex.n_exact AS recall
    FROM nex LEFT JOIN ivfh USING (query_id)
    """,
)
def sim_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the two approximate similarity paths against the exact
    brute-force baseline, per query and method (operators/similarity.py
    recall_at_k). Same corpus/query/quantizer construction as
    sim_topk_lsh_multiprobe and sim_topk_ivf; the oracle replays all three
    searches and the hit-set intersection in SQL. The division n_hit/5 is
    exact in binary, so recall is hash-safe."""
    from usgs_lidar_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_lsh_multiprobe,
        ivf_topk,
        recall_at_k,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk_bruteforce(
        emb, queries_df, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", k=5,
    )
    mp = cosine_topk_lsh_multiprobe(
        emb, queries_df, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", k=5, n_bits=8,
    )
    # `or` placeholder: on an EMPTY corpus there are no seeds; a 1-dim
    # zero centroid lets the plan still build (nothing executes over an
    # empty scan), so the query returns an empty frame with the correct
    # schema instead of an AnalysisException.
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    ] or [(0, [0.0])]
    ivf = ivf_topk(
        emb, queries_df, cents, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", k=5, n_probe=2,
    )
    r_mp = recall_at_k(mp, exact).withColumn("method", F.lit("lsh_multiprobe"))
    r_ivf = recall_at_k(ivf, exact).withColumn("method", F.lit("ivf"))
    return r_mp.unionByName(r_ivf).select(
        "method", "query_id", "n_hit", "n_exact", "recall"
    )


# =====================================================================
# Training-data pipeline ops (north-star extension): splits, sampling,
# contamination, sequence packing — operators/pipeline.py
# =====================================================================

#: SQL twin of operators/pipeline.portable_hash_bucket (two Lehmer/MINSTD
#: rounds; every intermediate < 2^47, so portable BIGINT arithmetic).
def _LEHMER_BUCKET(id_expr: str, seed: int = 0) -> str:
    # Positive remainder on the first step (DuckDB's % also follows the
    # dividend sign), mirroring the Spark side's pmod for negative ids.
    x = f"((((({id_expr}) + {1 + seed}) % 2147483647) + 2147483647) % 2147483647)"
    for _ in range(2):
        x = f"(({x}) * 48271) % 2147483647"
    return f"(({x}) % 10000)"


@query(
    "pipe_split_train_val_test",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, lang, {_LEHMER_BUCKET("doc_id")} AS bucket
        FROM documents
    ), s AS (
        SELECT lang,
               CASE WHEN bucket < 9000 THEN 'train'
                    WHEN bucket < 9500 THEN 'val'
                    ELSE 'test' END AS split,
               doc_id
        FROM b
    )
    SELECT split, lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM s GROUP BY split, lang
    """,
)
def pipe_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split by portable id-hash
    (operators/pipeline.split_by_hash): stable across reruns, engines and
    repartitioning, unlike randomSplit. Aggregated to (split, lang) counts
    + an id checksum that pins the exact membership of every split."""
    from usgs_lidar_spark.operators.pipeline import split_by_hash

    d = _t(spark, sf_dir, "documents")
    return (
        split_by_hash(d, "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").alias("id_sum"),
        )
    )


@query(
    "pipe_sample_stratified",
    oracle=f"""
    SELECT lang, count(*) AS n_sampled, CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM documents
    WHERE {_LEHMER_BUCKET("doc_id", seed=7)} < 1000
    GROUP BY lang
    """,
)
def pipe_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample (operators/pipeline.sample_stratified,
    seed=7), aggregated per language stratum with an id checksum. The
    id-hash rule makes membership reproducible and per-stratum share
    converge to the target fraction with zero shuffles."""
    from usgs_lidar_spark.operators.pipeline import sample_stratified

    d = _t(spark, sf_dir, "documents")
    return (
        sample_stratified(d, "doc_id", fraction=0.1, seed=7)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("doc_id").alias("id_sum"),
        )
    )


@query(
    "pipe_contamination",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
    ), bench AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
    ), csh0 AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, greatest(length(text) - 7, 0) + 1),
                          i -> substr(text, CAST(i AS INTEGER), 8))) AS shingle
            FROM corpus)
    ), cap AS (
        SELECT CAST(ceil(0.04 * count(DISTINCT doc_id)) AS BIGINT) AS max_df
        FROM csh0
    ), freq AS (
        SELECT shingle FROM csh0, cap
        GROUP BY shingle, max_df HAVING count(*) <= max_df
    ), csh AS (
        SELECT csh0.doc_id, csh0.shingle FROM csh0 JOIN freq USING (shingle)
    ), bsh AS (
        SELECT DISTINCT shingle FROM (
            SELECT unnest(list_transform(range(1, greatest(length(text) - 7, 0) + 1),
                          i -> substr(text, CAST(i AS INTEGER), 8))) AS shingle
            FROM bench)
    ), sizes AS (
        SELECT doc_id, count(*) AS n_shingles FROM csh GROUP BY doc_id
    ), hits AS (
        SELECT csh.doc_id, count(*) AS n_hit
        FROM csh JOIN bsh USING (shingle) GROUP BY csh.doc_id
    )
    SELECT h.doc_id, s.n_shingles, h.n_hit,
           CAST(h.n_hit AS DOUBLE) / s.n_shingles AS hit_frac
    FROM hits h JOIN sizes s USING (doc_id)
    WHERE CAST(h.n_hit AS DOUBLE) / s.n_shingles >= 0.2
    """,
)
def pipe_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan (operators/pipeline.contaminated_docs):
    every 97th document plays the held-out eval set; corpus documents
    sharing >=20% of their df-capped char-8 shingles with it are flagged.
    One shingle equi-join (tiny benchmark side -> AQE broadcast), bounded
    aggregates — the decontamination pass of an LLM data pipeline.

    The df cap is the SCALE-STABLE fractional form (max_df_frac=0.04:
    drop shingles in >4% of shingle-bearing corpus docs —
    ceil(0.04 * 494) = 20 at sf0.01, identical to the old absolute cap
    here but invariant in meaning as the corpus grows; SCALE.md measured
    the absolute max_df=20 silently cutting flagged docs 1194 -> 501 at
    10x corpus). The fraction resolves with ZERO extra corpus passes:
    the distinct-pairs frame is checkpoint-pinned, the denominator is a
    count(distinct doc_id) rider over the pin, and the df-cap window
    reads the same pin (r8 spent a second column-pruned corpus scan
    here). The absolute form stays available and unit-tested."""
    from usgs_lidar_spark.operators.pipeline import contaminated_docs

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    return contaminated_docs(
        corpus, bench, "text", "doc_id", k=8, max_df=None,
        max_df_frac=0.04, min_frac=0.2,
    ).select("doc_id", "n_shingles", "n_hit", "hit_frac")


@query(
    "pipe_pack_sequences",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, lang,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
        FROM documents
    ), packed AS (
        SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS token_start,
               CAST(sum(n_tokens) OVER w AS BIGINT) AS token_end
        FROM toks
        WINDOW w AS (PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT doc_id, lang, n_tokens, token_start,
           CAST(floor(token_start / 2048.0) AS BIGINT) AS pack_id,
           token_start % 2048 AS pack_offset,
           token_end > (floor(token_start / 2048.0) + 1) * 2048 AS split_across
    FROM packed
    """,
)
def pipe_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sequence packing (operators/pipeline.pack_sequences):
    per-language document streams concatenated into 2048-token packs,
    boundary-straddling docs flagged split_across — the pretraining
    loader's packing pass as one window over one shuffle."""
    from usgs_lidar_spark.functions.textstats import token_count
    from usgs_lidar_spark.operators.pipeline import pack_sequences

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return pack_sequences(
        d, "doc_id", token_count("text"), budget=2048, stream_col="lang"
    ).select(
        "doc_id", "lang", "n_tokens", "token_start", "pack_id",
        "pack_offset", "split_across",
    )


def _LEHMER_STREAM(id_expr: str, n_streams: int, seed: int = 0) -> str:
    """SQL twin of pack_sequences' default stream derivation:
    portable_hash_long(id, seed) % n_streams (full-range Lehmer, no
    10k bucket fold)."""
    x = f"((((({id_expr}) + {1 + seed}) % 2147483647) + 2147483647) % 2147483647)"
    for _ in range(2):
        x = f"(({x}) * 48271) % 2147483647"
    return f"(({x}) % {n_streams})"


@query(
    "pipe_pack_streams",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
               {_LEHMER_STREAM("doc_id", 8)} AS pack_stream
        FROM documents
    ), packed AS (
        SELECT doc_id, pack_stream, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS token_start,
               CAST(sum(n_tokens) OVER w AS BIGINT) AS token_end
        FROM toks
        WINDOW w AS (PARTITION BY pack_stream ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT doc_id, pack_stream, n_tokens, token_start,
           CAST(floor(token_start / 1024.0) AS BIGINT) AS pack_id,
           token_start % 1024 AS pack_offset,
           token_end > (floor(token_start / 1024.0) + 1) * 1024 AS split_across
    FROM packed
    """,
)
def pipe_pack_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pack_sequences' scale-safe DEFAULT: no caller stream key, so docs
    route into n_streams deterministic Lehmer-hash bucket streams
    (engine-portable — the oracle reproduces stream, offset, and split
    flags exactly) and each stream packs independently under one
    per-stream running-sum window. The pre-r6 global-window default was
    a single-task sort; this is what replaced it (VERDICT r5 item 5)."""
    from usgs_lidar_spark.functions.textstats import token_count
    from usgs_lidar_spark.operators.pipeline import pack_sequences

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return pack_sequences(
        d, "doc_id", token_count("text"), budget=1024, n_streams=8
    ).select(
        "doc_id", "pack_stream", "n_tokens", "token_start", "pack_id",
        "pack_offset", "split_across",
    )


@query(
    "pipe_pack_stats",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
               {_LEHMER_STREAM("doc_id", 8)} AS pack_stream
        FROM documents
    ), packed AS (
        SELECT doc_id, pack_stream, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS token_start,
               CAST(sum(n_tokens) OVER w AS BIGINT) AS token_end
        FROM toks
        WINDOW w AS (PARTITION BY pack_stream ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), rows_ AS (
        SELECT doc_id, pack_stream, n_tokens,
               CAST(floor(token_start / 1024.0) AS BIGINT) AS pack_id,
               token_end > (floor(token_start / 1024.0) + 1) * 1024
                   AS split_across
        FROM packed
    )
    SELECT pack_stream, pack_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_begun,
           CAST(sum(CASE WHEN split_across THEN 1 ELSE 0 END) AS BIGINT)
               AS n_split,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM rows_ GROUP BY pack_stream, pack_id
    """,
)
def pipe_pack_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard QA rollup over the packing pass: per (stream,
    pack), how many documents BEGIN there, their total tokens, how many
    straddle the boundary, and the id span — the census a loader team
    reads before training (empty-ish packs, split hotspots, id ordering
    sanity). One extra group-by on the packed frame's own keys — the
    pack window already shuffled on pack_stream, so the rollup is a
    cheap re-aggregation, and the output is bounded by total tokens /
    budget. Same parameters as `pipe_pack_streams` (budget=1024, 8
    Lehmer streams)."""
    from usgs_lidar_spark.functions.textstats import token_count
    from usgs_lidar_spark.operators.pipeline import pack_sequences

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    packed = pack_sequences(
        d, "doc_id", token_count("text"), budget=1024, n_streams=8
    )
    return packed.groupBy("pack_stream", "pack_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tokens_begun"),
        F.sum(F.col("split_across").cast("long")).cast("long").alias("n_split"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
    )


# =====================================================================
# Product quantization (north-star extension): compressed-domain ANN
# =====================================================================

def _sqd4(a: str, b: str) -> str:
    """DuckDB rounded squared-L2 expression between two list operands."""
    return f"""ROUND(
          list_sum(list_transform(list_zip({a}, {b}),
                   p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                        * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), 4)"""


@query(
    "sim_pq_adc_topk",
    oracle=f"""
    WITH js AS (
        SELECT CAST(unnest(range(4)) AS INTEGER) AS j
    ), cb AS (
        SELECT js.j, CAST(s.vec_id AS INTEGER) AS code,
               list_slice(s.embedding, js.j * 16 + 1, (js.j + 1) * 16) AS cvec
        FROM embeddings s CROSS JOIN js WHERE s.vec_id < 8
    ), enc AS (
        SELECT vec_id AS neighbor_id, j, code FROM (
            SELECT e.vec_id, cb.j, cb.code,
                   row_number() OVER (
                       PARTITION BY e.vec_id, cb.j
                       ORDER BY {_sqd4("list_slice(e.embedding, cb.j * 16 + 1, (cb.j + 1) * 16)", "cb.cvec")} ASC,
                                cb.code ASC) AS rn
            FROM embeddings e CROSS JOIN cb)
        WHERE rn = 1
    ), lut AS (
        SELECT q.vec_id AS query_id, cb.j, cb.code,
               CAST(ROUND({_sqd4("list_slice(q.embedding, cb.j * 16 + 1, (cb.j + 1) * 16)", "cb.cvec")} * 10000) AS BIGINT)
                   AS d_scaled
        FROM embeddings q CROSS JOIN cb WHERE q.vec_id < 5
    ), scored AS (
        SELECT l.query_id, e.neighbor_id,
               CAST(sum(l.d_scaled) AS BIGINT) AS adc_scaled
        FROM enc e JOIN lut l ON e.j = l.j AND e.code = l.code
        WHERE e.neighbor_id <> l.query_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc_scaled / 10000.0 AS adc_dist,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_scaled, neighbor_id) AS BIGINT)
               AS rank
    FROM scored QUALIFY rank <= 5
    """,
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: 4 subspaces x 16 dims, 8 codes per
    subspace seeded from the first corpus vectors (deterministic quantizer,
    same trick as sim_topk_ivf), asymmetric-distance top-5 per query.
    The corpus is consumed map-side (expression argmin encode, no shuffle
    of vectors); per-query LUTs broadcast; ADC sums ride scaled BIGINTs so
    the hash matches the oracle exactly. 64 floats -> 4 bytes per vector:
    the compressed-domain scan that makes 100 TB of embeddings rankable
    from memory."""
    from usgs_lidar_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks_from_rows,
    )

    emb = _t(spark, sf_dir, "embeddings")
    # empty-corpus placeholder (see the cents comment in sim_topk_ivf);
    # dim 4 keeps pq_codebooks_from_rows' n_sub=4 divisibility contract
    seeds = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ] or [[0.0] * 4]
    cbs = pq_codebooks_from_rows(seeds, n_sub=4)
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_adc_topk(
        emb, queries_df, cbs, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", k=5,
    )


@query(
    "sim_pq_recall",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        WHERE vec_id < 5
    ), exact AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.query_id
                       ORDER BY {_cos4("c.embedding", "q.qv")} DESC, c.vec_id)
                       AS rank
            FROM embeddings c, q WHERE c.vec_id <> q.query_id
        ) WHERE rank <= 5
    ), js AS (
        SELECT CAST(unnest(range(4)) AS INTEGER) AS j
    ), cb AS (
        SELECT js.j, CAST(s.vec_id AS INTEGER) AS code,
               list_slice(s.embedding, js.j * 16 + 1, (js.j + 1) * 16) AS cvec
        FROM embeddings s CROSS JOIN js WHERE s.vec_id < 8
    ), enc AS (
        SELECT vec_id AS neighbor_id, j, code FROM (
            SELECT e.vec_id, cb.j, cb.code,
                   row_number() OVER (
                       PARTITION BY e.vec_id, cb.j
                       ORDER BY {_sqd4("list_slice(e.embedding, cb.j * 16 + 1, (cb.j + 1) * 16)", "cb.cvec")} ASC,
                                cb.code ASC) AS rn
            FROM embeddings e CROSS JOIN cb)
        WHERE rn = 1
    ), lut AS (
        SELECT q.query_id, cb.j, cb.code,
               CAST(ROUND({_sqd4("list_slice(q.qv, cb.j * 16 + 1, (cb.j + 1) * 16)", "cb.cvec")} * 10000) AS BIGINT)
                   AS d_scaled
        FROM q CROSS JOIN cb
    ), pq AS (
        SELECT query_id, neighbor_id FROM (
            SELECT l.query_id, e.neighbor_id,
                   row_number() OVER (
                       PARTITION BY l.query_id
                       ORDER BY sum(l.d_scaled), e.neighbor_id) AS rank
            FROM enc e JOIN lut l ON e.j = l.j AND e.code = l.code
            WHERE e.neighbor_id <> l.query_id
            GROUP BY l.query_id, e.neighbor_id
        ) WHERE rank <= 5
    ), nex AS (
        SELECT query_id, count(*) AS n_exact FROM exact GROUP BY query_id
    ), hit AS (
        SELECT e.query_id, count(*) AS n_hit
        FROM exact e JOIN pq p
          ON e.query_id = p.query_id AND e.neighbor_id = p.neighbor_id
        GROUP BY e.query_id
    )
    SELECT nex.query_id,
           CAST(COALESCE(hit.n_hit, 0) AS BIGINT) AS n_hit,
           CAST(nex.n_exact AS BIGINT) AS n_exact,
           CAST(COALESCE(hit.n_hit, 0) AS DOUBLE) / nex.n_exact AS recall
    FROM nex LEFT JOIN hit USING (query_id)
    """,
)
def sim_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the product-quantization ADC search against the exact
    cosine baseline — the accuracy guard for the compressed-domain path
    (PQ ranks by quantized L2, exact ranks by cosine; on these unit-scale
    synthetic embeddings the orderings line up well enough for a stable
    recall signal)."""
    from usgs_lidar_spark.operators.similarity import (
        cosine_topk_bruteforce,
        pq_adc_topk,
        pq_codebooks_from_rows,
        recall_at_k,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk_bruteforce(
        emb, queries_df, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", k=5,
    )
    # empty-corpus placeholder (see the cents comment in sim_topk_ivf);
    # dim 4 keeps pq_codebooks_from_rows' n_sub=4 divisibility contract
    seeds = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ] or [[0.0] * 4]
    pq = pq_adc_topk(
        emb, queries_df, pq_codebooks_from_rows(seeds, n_sub=4),
        id_col="vec_id", vec_col="embedding", query_id_col="query_id", k=5,
    )
    return recall_at_k(pq, exact)


@query(
    "sim_topk_ivf_pq",
    oracle=f"""
    WITH cent AS (
        SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8
    ), csim AS (
        SELECT e.vec_id, e.embedding, c.cid,
               {_cos4("e.embedding", "c.cvec")} AS csim
        FROM embeddings e CROSS JOIN cent c
    ), assigned AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid) AS rn
            FROM csim) WHERE rn = 1
    ), probes AS (
        SELECT vec_id AS query_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid) AS rn
            FROM csim WHERE vec_id < 5) WHERE rn <= 2
    ), js AS (
        SELECT CAST(unnest(range(4)) AS INTEGER) AS j
    ), cb AS (
        SELECT js.j, CAST(s.vec_id AS INTEGER) AS code,
               list_slice(s.embedding, js.j * 16 + 1, (js.j + 1) * 16) AS cvec
        FROM embeddings s CROSS JOIN js WHERE s.vec_id < 8
    ), enc AS (
        SELECT vec_id AS neighbor_id, j, code FROM (
            SELECT e.vec_id, cb.j, cb.code,
                   row_number() OVER (
                       PARTITION BY e.vec_id, cb.j
                       ORDER BY {_sqd4("list_slice(e.embedding, cb.j * 16 + 1, (cb.j + 1) * 16)", "cb.cvec")} ASC,
                                cb.code ASC) AS rn
            FROM embeddings e CROSS JOIN cb)
        WHERE rn = 1
    ), lut AS (
        SELECT q.vec_id AS query_id, cb.j, cb.code,
               CAST(ROUND({_sqd4("list_slice(q.embedding, cb.j * 16 + 1, (cb.j + 1) * 16)", "cb.cvec")} * 10000) AS BIGINT)
                   AS d_scaled
        FROM embeddings q CROSS JOIN cb WHERE q.vec_id < 5
    ), cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM assigned a JOIN probes p ON a.cid = p.cid
        WHERE a.vec_id <> p.query_id
    ), scored AS (
        SELECT c.query_id, c.neighbor_id,
               CAST(sum(l.d_scaled) AS BIGINT) AS adc_scaled
        FROM cand c
        JOIN enc e ON e.neighbor_id = c.neighbor_id
        JOIN lut l ON l.query_id = c.query_id AND l.j = e.j AND l.code = e.code
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc_scaled / 10000.0 AS adc_dist,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_scaled, neighbor_id) AS BIGINT)
               AS rank
    FROM scored QUALIFY rank <= 5
    """,
)
def sim_topk_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN: the coarse quantizer (8 cells, n_probe=2 — same seeded
    construction as sim_topk_ivf) restricts candidates, and ranking inside
    the probed cells runs in the compressed domain (PQ asymmetric
    distance, same codebooks as sim_pq_adc_topk). Full vectors are read
    exactly once, at encode time; the canonical billion-scale layout."""
    from usgs_lidar_spark.operators.similarity import (
        ivf_pq_topk,
        pq_codebooks_from_rows,
    )

    emb = _t(spark, sf_dir, "embeddings")
    # empty-corpus placeholder (see the cents comment in sim_topk_ivf);
    # dim 4 keeps pq_codebooks_from_rows' n_sub=4 divisibility contract
    seeds = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ] or [[0.0] * 4]
    cents = [(i, v) for i, v in enumerate(seeds)]
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_pq_topk(
        emb, queries_df, cents, pq_codebooks_from_rows(seeds, n_sub=4),
        id_col="vec_id", vec_col="embedding", query_id_col="query_id",
        k=5, n_probe=2,
    )


def _flow_oracle() -> str:
    """Recursive-CTE replay of D8 flow accumulation: edges = steepest
    rounded drop (ties by stencil preference index, exactly the struct-max
    order in operators/terrain.d8_flow_directions); acc(c) = number of
    cells whose flow path reaches c (including itself)."""
    from usgs_lidar_spark.operators.terrain import D8_OFFSETS

    cands = []
    for idx, (dx, dy) in enumerate(D8_OFFSETS):
        s = _slot_name(dx, dy)
        dist = 1.4142135623730951 if dx != 0 and dy != 0 else 1.0
        cands.append(
            f"SELECT ix, iy, {dx} AS dx, {dy} AS dy, {idx} AS idx,\n"
            f"       ROUND((v_00 - {s}) / {dist!r}, 9) AS drp\n"
            f"FROM realc WHERE {s} IS NOT NULL"
        )
    cand_union = "\n        UNION ALL\n        ".join(cands)
    return f"""
    WITH RECURSIVE {_grid_cte()},
    cand AS (
        {cand_union}
    ), edges AS (
        SELECT ix, iy, ix + dx AS tix, iy + dy AS tiy FROM (
            SELECT ix, iy, dx, dy, drp,
                   row_number() OVER (PARTITION BY ix, iy
                                      ORDER BY drp DESC, idx ASC) AS rn
            FROM cand) WHERE rn = 1 AND drp > 0
    ), walk(sx, sy, cx, cy) AS (
        SELECT ix, iy, ix, iy FROM cells
        UNION
        SELECT w.sx, w.sy, e.tix, e.tiy
        FROM walk w JOIN edges e ON e.ix = w.cx AND e.iy = w.cy
    )
    SELECT cx AS ix, cy AS iy, count(*) AS acc
    FROM walk GROUP BY 1, 2
    """


@query("z3_flow_accumulation", oracle=None)
def z3_flow_accumulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z3: full iterative D8 flow accumulation over the voxel grid — the
    upstream-area computation the TWI one-hop proxy (z1) approximates,
    closing SCALE.md's 'iterative flow accumulation' item. Fixpoint
    rounds = longest drainage path; the oracle replays it as a recursive
    CTE (reachability count over the flow forest)."""
    from usgs_lidar_spark.operators.terrain import flow_accumulation

    return flow_accumulation(_price_qty_grid(spark, sf_dir))


ORACLE["z3_flow_accumulation"] = _flow_oracle()


# =====================================================================
# Classic star-schema analytics, round 4: q6 / q4-late / q14 shapes
# =====================================================================


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {DEC_SUM("l_extendedprice * l_discount", 4)} AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE year(l_shipdate) = 1996
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-pass filtered aggregate, the classic scan-
    dominated query — predicates push to parquet, one partial+final agg,
    revenue summed as scaled BIGINTs (price*discount carries 4 decimals)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.year("l_shipdate") == 1996)
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q4_late_shipment_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders with at least one
    late-shipped line — a correlated EXISTS realized as a left-semi hash
    join on orderkey with the lateness predicate as a join condition
    (no distinct, no double-count)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT
        100.0 * ({DEC_SUM("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 4)})
              / ({DEC_SUM("l_extendedprice * (1 - l_discount)", 4)}) AS promo_pct,
        count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE year(l_shipdate) = 1997
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share — broadcast dim join plus
    a conditional/total aggregate pair; both sums ride scaled BIGINTs so
    the ratio is bit-deterministic at any partitioning."""
    li = _t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1997)
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return j.agg(
        (
            F.lit(100.0) * dec_sum(promo, 4) / dec_sum(disc, 4)
        ).alias("promo_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               MIN(l_extendedprice) AS cost
        FROM lineitem GROUP BY 1, 2
    ), rc AS (
        SELECT c.partkey, c.suppkey, c.cost, s.s_name, n.n_name
        FROM cost c
        JOIN supplier s ON s.s_suppkey = c.suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT p.p_partkey, rc.suppkey AS s_suppkey, rc.s_name, rc.n_name,
           rc.cost AS min_cost
    FROM part p JOIN rc ON rc.partkey = p.p_partkey
    WHERE p.p_size <= 5
      AND rc.cost = (SELECT MIN(rc2.cost) FROM rc rc2
                     WHERE rc2.partkey = rc.partkey)
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each small part, the EUROPE supplier(s) whose
    offer cost equals the per-part minimum — the classic correlated
    MIN-subquery. No partsupp table in this schema, so the part-supplier
    cost relation is derived as MIN(l_extendedprice) per (part, supplier)
    from lineitem (reference has no supplier dimension at all; this is
    the engine-surface form of its per-group-argmin idiom,
    /root/reference/scripts/usgs_lidar.py catalog min-year selection).

    Spark realization: both restrictions land on GROUP KEYS (partkey,
    suppkey), so they push BELOW the aggregate — lineitem is semi-joined
    against the broadcast size-filtered part set and the broadcast
    EUROPE supplier set before anything shuffles, shrinking the
    aggregate's input (and its shuffle) by the filters' combined
    selectivity (~10x here). The correlated subquery is then a per-part
    MIN window over the small restricted cost relation — one more
    (tiny) shuffle keyed by partkey replaces the rejoin a naive
    translation would add; lineitem is the only big table and is
    touched once.
    """
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 5)
        .select("p_partkey")
    )
    restricted = li.join(
        F.broadcast(p.select("p_partkey")),
        li["l_partkey"] == F.col("p_partkey"),
        "left_semi",
    ).join(
        F.broadcast(supp.select("s_suppkey")),
        li["l_suppkey"] == F.col("s_suppkey"),
        "left_semi",
    )
    cost = restricted.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min("l_extendedprice").alias("cost"))
    w = Window.partitionBy("partkey")
    return (
        cost.withColumn("__min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("__min_cost"))
        .join(F.broadcast(supp), F.col("suppkey") == supp["s_suppkey"])
        .select(
            F.col("partkey").alias("p_partkey"),
            F.col("suppkey").alias("s_suppkey"),
            "s_name",
            "n_name",
            F.col("cost").alias("min_cost"),
        )
    )


@query(
    "q11_part_value_share",
    oracle=f"""
    WITH val AS (
        SELECT l_partkey AS partkey,
               {DEC_SUM("l_extendedprice * l_quantity", 4)} AS part_value
        FROM lineitem GROUP BY 1
    ), tot AS (SELECT SUM(part_value) AS total_value FROM val)
    SELECT v.partkey, v.part_value,
           v.part_value / t.total_value AS share
    FROM val v CROSS JOIN tot t
    WHERE v.part_value > 0.0008 * t.total_value
    """,
)
def q11_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value vs a fraction of the
    GLOBAL total — group aggregate compared against a global aggregate.

    Spark realization: the global total is a 1-row aggregate cross-joined
    back with an explicit broadcast (the a1_global_minmax scalar pattern)
    — no collect. The per-part aggregate feeds BOTH the total and the
    output, so it is localCheckpoint-materialized (part-level cardinality
    — tiny next to lineitem): without that, Catalyst plans two full
    lineitem scans (exchange reuse did not fire on this shape, verified
    on the executed plan), and the alternative — an unpartitioned window
    for the total — funnels every part row through one partition. One
    lineitem scan, then two cheap aggregates over part-level rows. Value
    sums ride scaled BIGINTs (dec_sum) so the share division and the
    threshold comparison are bit-deterministic at any partitioning.
    """
    li = _t(spark, sf_dir, "lineitem")
    val = (
        li.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            dec_sum(F.col("l_extendedprice") * F.col("l_quantity"), 4).alias(
                "part_value"
            )
        )
        .localCheckpoint(eager=False)
    )
    tot = val.agg(F.sum("part_value").alias("total_value"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("part_value") > 0.0008 * F.col("total_value"))
        .select(
            "partkey",
            "part_value",
            (F.col("part_value") / F.col("total_value")).alias("share"),
        )
    )


@query(
    "q16_supplier_count",
    oracle="""
    WITH ps AS (
        SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
        FROM lineitem
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.suppkey) AS supplier_cnt
    FROM ps JOIN part p ON p.p_partkey = ps.partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND ps.suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    with a NOT-IN supplier exclusion. The NOT IN realizes as a broadcast
    LEFT ANTI join against the (tiny) excluded-supplier set — correct
    here because s_suppkey is non-null; a nullable NOT-IN column would
    need the null-aware variant. The part predicate lives in a broadcast
    dim join; COUNT(DISTINCT) runs on the already-distinct (part,
    supplier) pairs, a two-phase hash aggregate with map-side partials.
    """
    li = _t(spark, sf_dir, "lineitem")
    ps = (
        li.select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .distinct()
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("suppkey"))
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    return (
        ps.join(F.broadcast(bad), "suppkey", "left_anti")
        .join(F.broadcast(p), ps["partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH pq AS (
        SELECT l_partkey AS partkey,
               SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS sq,
               count(*) AS c
        FROM lineitem GROUP BY 1
    )
    SELECT {DEC_SUM("l.l_extendedprice", 2)} / 7.0 AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq    ON pq.partkey   = l.l_partkey
    WHERE p.p_brand = 'Brand#12'
      AND CAST(ROUND(l.l_quantity * 100) AS BIGINT) * 5 * pq.c < pq.sq
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lines under 20% of their part's
    average quantity — the correlated AVG subquery. The per-part average
    is a groupBy over lineitem re-joined on partkey (2-phase hash agg,
    then an equi-join AQE broadcasts when the part-stats side is small);
    the 20%-of-average comparison is EXACT integer arithmetic
    (qty_scaled * 5 * count < sum_scaled), so no float threshold can
    disagree between engines at any partitioning."""
    li = _t(spark, sf_dir, "lineitem")
    pq = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("sq"),
        F.count(F.lit(1)).alias("c"),
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#12")
        .select("p_partkey")
    )
    qs = F.round(F.col("l_quantity") * 100).cast("long")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(pq, li["l_partkey"] == pq["partkey"])
        .filter(qs * 5 * F.col("c") < F.col("sq"))
        .agg(
            (dec_sum("l_extendedprice", 2) / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q18_large_volume_customers",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey,
               {DEC_SUM("l_quantity", 2)} AS sum_qty
        FROM lineitem GROUP BY 1
        HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 25000
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, big.sum_qty
    FROM big
    JOIN orders o   ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind the largest-volume orders — a
    HAVING-filtered aggregate driving a fact-to-fact join. The per-order
    quantity sum shuffles lineitem by orderkey once; the HAVING filter
    shrinks that side to the big orders BEFORE the orders join (AQE
    broadcasts the survivors), and the customer dim joins broadcast.
    Quantity sums ride scaled BIGINTs, and the HAVING threshold compares
    the scaled integer itself — bit-deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("__sq")
        )
        .filter(F.col("__sq") > 25000)
        .select(
            "l_orderkey", (F.col("__sq") / F.lit(100.0)).alias("sum_qty")
        )
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


@query(
    "asof_salted_purchase_before_click",
    oracle="""
    WITH e AS (
        SELECT event_id, date_trunc('microseconds', ts) AS ts,
               user_id, event_type, value
        FROM events
    ), c AS (SELECT * FROM e WHERE event_type = 'click'),
       p AS (SELECT * FROM e WHERE event_type = 'purchase')
    SELECT c.event_id AS click_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS asof_ts,
           p.value AS asof_value
    FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_salted_purchase_before_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-key (time-bucket-salted) as-of over the same click/purchase
    semantics as asof_purchase_before_click — one hour buckets, identical
    oracle, so the skew path carries the same hard signal as the plain
    path (operators/asof.py::asof_join_salted)."""
    from usgs_lidar_spark.operators.asof import asof_join_salted

    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", "event_id"
    )
    joined = asof_join_salted(
        clicks,
        purchases,
        partition_keys=["user_id"],
        ts_col="ts",
        payload_cols=["value"],
        bucket_width_seconds=3600,
        tie_break="event_id",
    )
    return joined.select(
        "click_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("asof_ts"),
        F.col("asof_value"),
    )


def _fp_sql(col: str, prefix: int = 64, mod: int = 1000000007) -> str:
    """DuckDB twin of functions/textstats.fingerprint over any column."""
    return f"""CASE WHEN length({col}) < 1 THEN CAST(0 AS BIGINT) ELSE
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, least(length({col}), {prefix}) + 1),
                   i -> CAST(ord(substr({col}, CAST(i AS INTEGER), 1)) AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % {mod})
           END"""


@query(
    "pipe_split_by_source",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, source,
               {_LEHMER_BUCKET(_fp_sql("source"))} AS bucket
        FROM documents
    ), s AS (
        SELECT source, doc_id,
               CASE WHEN bucket < 9000 THEN 'train'
                    WHEN bucket < 9500 THEN 'val'
                    ELSE 'test' END AS split
        FROM b
    )
    SELECT split, count(DISTINCT source) AS n_sources, count(*) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM s GROUP BY split
    """,
)
def pipe_split_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe group split (operators/pipeline.split_by_group): the
    whole `source` domain moves together, so origin-correlated near-dups
    cannot straddle train/test. Aggregated per split with a doc-id
    checksum pinning exact membership; sources-per-split counts make the
    grouping visible (each source appears under exactly one split)."""
    from usgs_lidar_spark.operators.pipeline import split_by_group

    d = _t(spark, sf_dir, "documents")
    return (
        split_by_group(d, "source")
        .groupBy("split")
        .agg(
            F.countDistinct("source").alias("n_sources"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
        )
    )


@query(
    "sim_topk_lsh_multiprobe2",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, embedding, {_LSH_BUCKET_SQL} AS bucket FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, embedding AS qv, bucket
        FROM base WHERE vec_id < 5
    ), sims AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               {_cos4("c.embedding", "q.qv")} AS sim
        FROM base c JOIN q ON bit_count(xor(c.bucket, q.bucket)) <= 2
                          AND c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, sim,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS BIGINT)
               AS rank
    FROM sims QUALIFY rank <= 5
    """,
)
def sim_topk_lsh_multiprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-2 multi-probe LSH top-k: the widest rung of the probe
    ladder (home + 1-bit + 2-bit flip buckets = 37/256 of the corpus per
    query). The oracle joins on bit_count(xor) <= 2 — exactly the probe
    set."""
    from usgs_lidar_spark.operators.similarity import cosine_topk_lsh_multiprobe2

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk_lsh_multiprobe2(
        emb, queries_df, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", k=5, n_bits=8,
    )


@query(
    "pipe_end_to_end",
    oracle=f"""
    WITH keeps AS (
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
    ), d AS (
        SELECT doc_id, text FROM documents JOIN keeps USING (doc_id)
    ), s AS (
        SELECT doc_id, text,
               CASE WHEN {_LEHMER_BUCKET("doc_id")} < 9000 THEN 'train'
                    WHEN {_LEHMER_BUCKET("doc_id")} < 9500 THEN 'val'
                    ELSE 'test' END AS split
        FROM d
    ), toks AS (
        SELECT doc_id, split,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
        FROM s
    ), packed AS (
        SELECT doc_id, split, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS token_start
        FROM toks
        WINDOW w AS (PARTITION BY split ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT split, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(max(floor(token_start / 2048.0)) + 1 AS BIGINT) AS n_packs,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM packed GROUP BY split
    """,
)
def pipe_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data pipeline composed end to end: exact dedup keeps
    one representative per text, the survivors split 90/5/5 by portable
    hash, and each split's stream packs into 2048-token sequences — three
    operators chained exactly as a corpus build would run them, verified
    as one oracle (per-split doc/token/pack counts + id checksum)."""
    from usgs_lidar_spark.functions.textstats import token_count
    from usgs_lidar_spark.operators.dedup import exact_dedup
    from usgs_lidar_spark.operators.pipeline import pack_sequences, split_by_hash

    d = _t(spark, sf_dir, "documents")
    keeps = exact_dedup(d, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    survivors = d.join(keeps, "doc_id").select("doc_id", "text")
    packed = pack_sequences(
        split_by_hash(survivors, "doc_id"),
        "doc_id",
        token_count("text"),
        budget=2048,
        stream_col="split",
    )
    return packed.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.max(F.floor(F.col("token_start") / 2048.0)) + 1)
        .cast("long")
        .alias("n_packs"),
        F.sum("doc_id").alias("id_sum"),
    )


@query(
    "ts1_resample_gap_fill",
    oracle=f"""
    WITH e AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS b, value FROM events
    ), agg AS (
        SELECT event_type, b, count(*) AS n_events,
               {DEC_SUM("value")} AS value_sum
        FROM e GROUP BY 1, 2
    ), rng AS (
        SELECT event_type, min(b) AS b0, max(b) AS b1 FROM agg GROUP BY 1
    ), dense AS (
        SELECT event_type, unnest(range(b0, b1 + 1)) AS b FROM rng
    ), j AS (
        SELECT d.event_type, d.b, a.n_events, a.value_sum,
               a.value_sum IS NULL AS is_gap
        FROM dense d LEFT JOIN agg a USING (event_type, b)
    )
    SELECT event_type,
           strftime(make_timestamp(b * 3600000000), '%Y-%m-%d %H:%M:%S')
               AS bucket_start,
           CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
           last_value(value_sum IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_sum,
           is_gap
    FROM j
    """,
)
def ts1_resample_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS1: hourly resample of the event stream per type, densified over
    each key's observed span with forward-filled value sums and zeroed
    counts on gap rows (operators/resample.py) — the regular-grid step
    between raw events and windowed model inputs. One aggregate shuffle,
    an output-proportional sequence() explode, one running window."""
    from usgs_lidar_spark.operators.resample import gap_fill, resample_events

    ev = _t(spark, sf_dir, "events")
    res = resample_events(
        ev,
        "ts",
        ["event_type"],
        {"n_events": F.count(F.lit(1)), "value_sum": dec_sum("value")},
        step_seconds=3600,
    )
    filled = gap_fill(res, ["event_type"], ["value_sum"], step_seconds=3600)
    return filled.select(
        "event_type",
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias(
            "bucket_start"
        ),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        "value_sum",
        "is_gap",
    )


@query(
    "w2_range_rolling_sum",
    oracle=f"""
    SELECT event_id, user_id,
           strftime(date_trunc('microseconds', ts), '%Y-%m-%d %H:%M:%S.%f')
               AS ts_s,
           CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS DOUBLE)
               / 100.0 AS value_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def w2_range_rolling_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: RANGE-framed rolling window — per user, the count and exact
    value sum of events in the trailing hour of EVENT TIME (a range frame
    over timestamps, not a row frame; the form w1 doesn't cover). Spark
    side orders by epoch seconds with rangeBetween(-3600, 0); scaled-long
    sums keep the rolling values hash-exact."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        (
            F.sum(F.round(F.col("value") * 100).cast("long")).over(w)
            / F.lit(100.0)
        ).alias("value_last_hour"),
    )


@query(
    "w1_ntile_cume",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           cume_dist() OVER w AS cd,
           percent_rank() OVER w AS pr
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def w1_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 family completion: ntile / cume_dist / percent_rank per priority
    partition, ordered with a unique tie-break so every rank value is
    engine-deterministic. cume_dist and percent_rank are exact binary
    ratios of integers — hash-safe without rounding."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cd"),
        F.percent_rank().over(w).alias("pr"),
    )


@query(
    "a7_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus)
                AS BIGINT) AS gid,
           count(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus), ())
    """,
)
def a7_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: explicit GROUPING SETS with grouping_id — the generalized
    rollup/cube form (all four set shapes in one pass, one shuffle).
    The gid column distinguishes a real NULL group key from a superset
    placeholder; money totals stay scaled BIGINTs."""
    o = _t(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus)
                    AS BIGINT) AS gid,
               count(*) AS n,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
        FROM {o}
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus), ())
        """,
        o=o,
    )


@query(
    "a8_ordered_listagg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS names,
           count(*) AS n
    FROM nation GROUP BY n_regionkey
    """,
)
def a8_ordered_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: deterministic list aggregation — names per region joined in
    SORTED order (collect_list alone is partition-order-nondeterministic;
    sort_array makes it engine-comparable, DuckDB's ORDER BY inside
    string_agg is the SQL twin)."""
    n = _t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("names"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "z5_voxel_pyramid",
    oracle="""
    WITH mins AS (SELECT min(l_extendedprice) AS mp, min(l_quantity) AS mq
                  FROM lineitem),
    base AS (
        SELECT CAST(floor((l_extendedprice - mp) / 5000.0) AS BIGINT) AS ix,
               CAST(floor((l_quantity - mq) / 5.0) AS BIGINT) AS iy,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS sx,
               CAST(ROUND(l_quantity) AS BIGINT) AS sy
        FROM lineitem, mins
    ), lv AS (SELECT CAST(unnest([0, 1, 2]) AS BIGINT) AS level)
    SELECT lv.level,
           CAST(floor(ix / power(2, lv.level)) AS BIGINT) AS ix,
           CAST(floor(iy / power(2, lv.level)) AS BIGINT) AS iy,
           CAST(SUM(sx) AS DOUBLE) / (100.0 * count(*)) AS cx,
           CAST(SUM(sy) AS DOUBLE) / (1.0 * count(*)) AS cy,
           count(*) AS n_points
    FROM base CROSS JOIN lv
    GROUP BY 1, 2, 3
    """,
)
def z5_voxel_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z5: 3-level LOD voxel pyramid over the price/quantity grid — the
    EPT-octree-levels analog, built bottom-up (one raw scan + grid-sized
    merges). The oracle aggregates every level DIRECTLY from the raw rows;
    hash equality proves the hierarchical merge is exact, which only the
    scaled-integer-sum state makes possible."""
    from usgs_lidar_spark.operators.voxel import voxel_pyramid

    li = _t(spark, sf_dir, "lineitem").select("l_extendedprice", "l_quantity")
    pyr = voxel_pyramid(
        li,
        axes=["l_extendedprice", "l_quantity"],
        resolutions=[5000.0, 5.0],
        levels=3,
        exact_decimals=[2, 0],
    )
    return pyr.select(
        "level",
        F.col("il_extendedprice").alias("ix"),
        F.col("il_quantity").alias("iy"),
        F.col("cl_extendedprice").alias("cx"),
        F.col("cl_quantity").alias("cy"),
        "n_points",
    )


@query(
    "pipe_sample_weighted",
    oracle=f"""
    SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM (
        SELECT doc_id, lang,
               least(greatest(CAST(n_chars AS DOUBLE) / 800.0, 0.0), 1.0) AS w
        FROM documents
    )
    WHERE {_LEHMER_BUCKET("doc_id", seed=3)} < w * 10000
    GROUP BY lang
    """,
)
def pipe_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling: keep probability scales
    with document length (n_chars/800, clamped to 1) — longer documents
    always survive, short ones proportionally (operators/pipeline.
    sample_weighted). Aggregated per language with an id checksum."""
    from usgs_lidar_spark.operators.pipeline import sample_weighted

    d = _t(spark, sf_dir, "documents")
    w = F.col("n_chars").cast("double") / 800.0
    return (
        sample_weighted(d, "doc_id", w, seed=3)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("id_sum"),
        )
    )


@query(
    "pipe_token_quota",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, source,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS t
        FROM documents
    ), cum AS (
        SELECT doc_id, source, t,
               sum(t) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS c
        FROM toks
    )
    SELECT source, count(*) AS n_docs, CAST(max(c) AS BIGINT) AS tokens_used,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM cum WHERE c <= 20000 GROUP BY source
    """,
)
def pipe_token_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing quota (operators/pipeline.cap_tokens_per_group): each
    source contributes at most 20k tokens, documents admitted in id order
    until the cap — the mixing-control step that stops one domain from
    dominating a corpus. Per-source kept-doc counts, tokens used, and an
    id checksum pin exact membership."""
    from usgs_lidar_spark.functions.textstats import token_count
    from usgs_lidar_spark.operators.pipeline import cap_tokens_per_group

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    kept = cap_tokens_per_group(
        d, "doc_id", token_count("text"), "source", max_tokens_per_group=20000
    )
    toks = token_count("text")
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("tokens_used"),
        F.sum("doc_id").alias("id_sum"),
    )


@query(
    "pipe_global_shuffle",
    oracle="""
    WITH keyed AS (
        SELECT doc_id,
               ((((doc_id % 2147483647) + 1) % 2147483647)
                 * 48271 % 2147483647) * 48271 % 2147483647 AS k
        FROM documents
    )
    SELECT doc_id, CAST(k % 8 AS INTEGER) AS shard,
           CAST(row_number() OVER (PARTITION BY k % 8 ORDER BY k, doc_id)
                AS BIGINT) AS shard_pos
    FROM keyed
    """,
)
def pipe_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle into 8 shards
    (operators/pipeline.global_shuffle): every document gets a
    reproducible pseudo-random shard and in-shard position — no
    orderBy(rand()), no global sort; shards order independently. The
    oracle replays the Lehmer key chain in plain 64-bit SQL arithmetic,
    so every document's exact (shard, position) must agree."""
    from usgs_lidar_spark.operators.pipeline import global_shuffle

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return global_shuffle(d, "doc_id", n_shards=8).select(
        "doc_id", "shard", "shard_pos"
    )


@query(
    "dedup_exact_incremental",
    oracle="""
    WITH seen AS (
        SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 250
    ), batch AS (
        SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id >= 250
    )
    SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
           count(*) AS n_copies
    FROM batch ANTI JOIN seen USING (h)
    GROUP BY h
    """,
)
def dedup_exact_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-ingest exact dedup
    (operators/pipeline.exact_dedup_incremental): the first 250 documents
    are the already-ingested corpus (represented ONLY by md5 digests —
    the historical text never moves); the rest arrive as a new batch,
    drop anything already seen, and collapse within-batch duplicates to
    (keep_id, n_copies). md5, not xxhash64, so the whole operator is
    SQL-reproducible."""
    from usgs_lidar_spark.operators.pipeline import exact_dedup_incremental

    d = _t(spark, sf_dir, "documents")
    return exact_dedup_incremental(
        d.filter(F.col("doc_id") >= 250), d.filter(F.col("doc_id") < 250)
    )


@query(
    "q20_dominant_part_suppliers",
    oracle="""
    WITH ps AS (
        SELECT l_suppkey, l_partkey,
               SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS sq
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
          AND year(l_shipdate) = 1997
        GROUP BY 1, 2
    ), shares AS (
        SELECT l_suppkey, sq,
               SUM(sq) OVER (PARTITION BY l_partkey) AS tq
        FROM ps
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
        SELECT l_suppkey FROM shares WHERE sq * 5 > tq
    )
    """,
)
def q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the nested-IN pipeline — suppliers who ship more
    than 20% of some PROMO part's 1997 volume. Part set membership is a
    broadcast semi-join (the inner IN), the per-(part, supplier) volumes
    aggregate once, the part total is a window over that aggregate (NOT a
    second lineitem scan), and the dominance test is exact integer
    arithmetic (sq * 5 > tq). The qualifying-supplier set feeds a
    broadcast left-semi join against the supplier dim (the outer IN).
    One lineitem scan, two shuffles (agg + window), everything else
    broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    base = li.filter(F.year("l_shipdate") == 1997).join(
        F.broadcast(p), li["l_partkey"] == p["p_partkey"], "left_semi"
    )
    ps = base.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("sq")
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        ps.withColumn("tq", F.sum("sq").over(w))
        .filter(F.col("sq") * 5 > F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(dominant), s["s_suppkey"] == dominant["l_suppkey"], "left_semi")
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("s_suppkey", "s_name", "n_name")
    )


@query(
    "pipe_end_to_end_v2",
    oracle=r"""
    WITH seen AS (
        SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 250
    ), batch AS (
        SELECT doc_id, text, md5(text) AS h FROM documents WHERE doc_id >= 250
    ), fresh AS (
        SELECT min(doc_id) AS doc_id
        FROM batch ANTI JOIN seen USING (h)
        GROUP BY h
    ), d AS (
        SELECT b.doc_id, b.text,
               ((((b.doc_id % 2147483647) + 1) % 2147483647)
                 * 48271 % 2147483647) * 48271 % 2147483647 AS k
        FROM batch b JOIN fresh USING (doc_id)
    ), sharded AS (
        SELECT doc_id, text, CAST(k % 4 AS INTEGER) AS shard,
               row_number() OVER (PARTITION BY k % 4 ORDER BY k, doc_id)
                   AS shard_pos
        FROM d
    ), toks AS (
        SELECT doc_id, shard, shard_pos,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END
                   AS n_tokens
        FROM sharded
    ), packed AS (
        SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS token_start
        FROM toks
        WINDOW w AS (PARTITION BY shard ORDER BY shard_pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT shard, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(max(floor(token_start / 512.0)) + 1 AS BIGINT) AS n_packs,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM packed GROUP BY shard
    """,
)
def pipe_end_to_end_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-5 ingest pipeline composed end to end: an incoming batch
    (doc_id >= 250) dedups against the already-ingested corpus by md5
    digest, survivors shuffle deterministically into 4 training shards,
    and each shard packs into 512-token sequences IN SHARD ORDER
    (pack_sequences keyed by shard_pos, so pack boundaries follow the
    training order, not raw ids) — ingest-dedup -> shuffle -> pack as one
    oracle (per-shard doc/token/pack counts + id checksum)."""
    from usgs_lidar_spark.functions.textstats import token_count
    from usgs_lidar_spark.operators.pipeline import (
        exact_dedup_incremental,
        global_shuffle,
        pack_sequences,
    )

    d = _t(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") >= 250).select("doc_id", "text")
    seen = d.filter(F.col("doc_id") < 250)
    keeps = exact_dedup_incremental(batch, seen).select(
        F.col("keep_id").alias("doc_id")
    )
    survivors = batch.join(keeps, "doc_id")
    sharded = global_shuffle(survivors, "doc_id", n_shards=4)
    packed = pack_sequences(
        sharded, "shard_pos", token_count("text"), budget=512,
        stream_col="shard",
    )
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.max(F.floor(F.col("token_start") / 512.0)) + 1)
        .cast("long")
        .alias("n_packs"),
        F.sum("doc_id").alias("id_sum"),
    )


@query(
    "dedup_levenshtein",
    oracle="""
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.text, b.text) AS INTEGER) AS lev
    FROM documents a JOIN documents b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
     AND abs(length(a.text) // 16 - length(b.text) // 16) <= 1
    WHERE levenshtein(a.text, b.text) <= 40
    """,
)
def dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs (operators/dedup.
    levenshtein_near_dup_pairs): language + length-bucket blocking, then
    JVM-side Levenshtein verify at distance <= 40 — the dedup modality
    that catches small in-place mutations (typos, template fills) that
    shingle Jaccard over-penalizes. The probe-side bucket expansion
    {b-1, b, b+1} is exactly the oracle's |bucket diff| <= 1 join; both
    engines run the classic edit-distance, so the distances themselves
    hash-match."""
    from usgs_lidar_spark.operators.dedup import levenshtein_near_dup_pairs

    d = _t(spark, sf_dir, "documents")
    return levenshtein_near_dup_pairs(
        d, "text", "doc_id", max_distance=40, block_cols=["lang"],
        bucket_width=16,
    )


@query(
    "events_zscore_outliers",
    oracle="""
    WITH stats AS (
        SELECT event_type, count(*) AS n,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS s,
               SUM(CAST(ROUND(value * 100) AS BIGINT)
                   * CAST(ROUND(value * 100) AS BIGINT)) AS q
        FROM events GROUP BY event_type
    ), z AS (
        SELECT e.event_id, e.event_type, e.value,
               (e.value - CAST(st.s AS DOUBLE) / (100.0 * st.n))
               / sqrt(CAST(st.q AS DOUBLE) / (10000.0 * st.n)
                      - (CAST(st.s AS DOUBLE) / (100.0 * st.n))
                        * (CAST(st.s AS DOUBLE) / (100.0 * st.n))) AS z
        FROM events e JOIN stats st USING (event_type)
    )
    SELECT event_id, event_type, value, z FROM z WHERE abs(z) > 3.0
    """,
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group outlier detection: events more than 3 population
    standard deviations from their event_type's mean. Moments are EXACT
    scaled-BIGINT sums (value carries 2 decimals; the squared sum stays
    in 64 bits up to ~4e9 rows per group — past that, widen to
    decimal(38)), so mean/variance/z are bit-identical on any
    partitioning and engine; the 5-row stats table broadcasts back onto
    the scan. One shuffle (the stats aggregate), map-only scoring."""
    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    vs = F.round(F.col("value") * 100).cast("long")
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vs).alias("s"),
        F.sum(vs * vs).alias("q"),
    )
    mean = F.col("s").cast("double") / (F.lit(100.0) * F.col("n"))
    mean2 = F.col("q").cast("double") / (F.lit(10000.0) * F.col("n"))
    var = mean2 - mean * mean
    # Zero-variance groups (constant value, or a single row) have no
    # outliers by definition; without the guard the division is 0/0 —
    # an ArithmeticException under ANSI mode. The oracle needs no twin:
    # its x/0.0 yields NaN/inf, which abs(z) > 3 filters the same way.
    z = F.when(var > 0, (F.col("value") - mean) / F.sqrt(var))
    return (
        e.join(F.broadcast(stats), "event_type")
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > 3.0)
        .select("event_id", "event_type", "value", "z")
    )


@query(
    "events_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > v.t_view
          AND e.ts <= v.t_view + INTERVAL 24 HOUR
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          AND e.ts <= c.t_click + INTERVAL 24 HOUR
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_view_click_purchase
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who viewed, then clicked AFTER
    their first view, then purchased AFTER that first qualifying click —
    the sequential-pattern shape (each stage anchors on the previous
    stage's timestamp, not mere event presence). Three per-user min
    aggregates chained by joins; each stage's frame shrinks, AQE
    broadcasts the survivor sets, and nothing needs a per-user ordered
    buffer. Ties on the anchor timestamp use strict >, matching the
    oracle exactly."""
    e = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    counts = [
        df.agg(F.count(F.lit(1)).alias(name))
        for df, name in ((v, "n_view"), (c, "n_view_click"),
                         (p, "n_view_click_purchase"))
    ]
    out = counts[0]
    for one in counts[1:]:
        out = out.crossJoin(F.broadcast(one))
    return out


# =====================================================================
# Round 5 (cont.): the remaining classic star-schema shapes — q7/q8/q9
# (multi-dim snowflake rollups), q10 (top-k by exact revenue), q12
# (conditional-count buckets), q13 (outer-join histogram). Reference
# analog: the catalog join/aggregate surface (SURVEY §2 J/A/G rows);
# shapes follow the public TPC-H spec re-grounded on this synthetic
# schema (no partsupp/shipmode/commitdate columns — each docstring
# notes the substitution).
# =====================================================================


@query(
    "q7_nation_trade_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           {DEC_SUM("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND year(l_shipdate) IN (1996, 1997)
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year. The nation pair predicate is applied to the two broadcast
    nation dims BEFORE the fact joins, so the supplier and customer
    sides shrink to the two nations' keys first and the only shuffle is
    the orders join (lineitem x orders on orderkey); supplier/customer/
    nation all broadcast. The OR-of-pairs predicate lands after both
    nation names are attached — Catalyst cannot push a cross-dim OR
    below the join, but both dim joins are broadcasts so nothing extra
    shuffles."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate").isin(1996, 1997)
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    n1 = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation",
        F.year("l_shipdate").alias("l_year"),
    ).agg(
        dec_sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 4)
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "q8_market_share",
    oracle=f"""
    WITH v AS (
        SELECT year(l_shipdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n1.n_name AS supp_nation
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = n2.n_regionkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    )
    SELECT CAST(o_year AS INTEGER) AS o_year,
           ({DEC_SUM("CASE WHEN supp_nation = 'NATION_8' THEN volume ELSE 0.0 END", 4)})
         / ({DEC_SUM("volume", 4)}) AS mkt_share,
           count(*) AS n_lines
    FROM v GROUP BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_8's share of the ASIA PROMO-part market by
    year. Customer-side nation->region restricts the market; the
    supplier-side nation only labels lines. All five dims broadcast
    (region filter applied to nation keys driver-free via broadcast
    joins); the fact shuffles once for the orderkey join and once for
    the year aggregate. Both sums ride scaled BIGINTs so the share
    ratio is bit-deterministic under any partitioning."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # customer nations restricted to the ASIA region (broadcast chain)
    n2 = (
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    n1 = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"), "left_semi")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
    )
    vol = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    nation_vol = F.when(F.col("supp_nation") == "NATION_8", vol).otherwise(F.lit(0.0))
    return (
        j.groupBy(F.year("l_shipdate").alias("o_year"))
        .agg(
            (dec_sum(nation_vol, 4) / dec_sum(vol, 4)).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(l_shipdate) AS INTEGER) AS o_year,
           {DEC_SUM("l_extendedprice * (1 - l_discount)"
                    " - 0.5 * p_retailprice * l_quantity", 4)} AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'widget' parts by supplier nation and
    year. This schema has no partsupp, so supply cost is modeled as
    half the part's retail price per unit (the docstring-level
    substitution; the plan shape — LIKE-filtered part dim driving a
    fact aggregate over two broadcast dims — is the point). The LIKE
    filter shrinks part before broadcast; no orders join is needed
    because year comes from l_shipdate. Exactly one fact shuffle (the
    group-by)."""
    li = _t(spark, sf_dir, "lineitem")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
    )
    amount = (
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("l_shipdate").alias("o_year"),
    ).agg(dec_sum(amount, 4).alias("profit"))


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {DEC_SUM("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
           c_acctbal, n_name
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND year(o_orderdate) = 1997 AND quarter(o_orderdate) = 1
    GROUP BY 1, 2, 4, 5
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    quarter. The quarter filter lands on orders BEFORE the fact join
    (pushed to the parquet scan), l_returnflag pushes to the lineitem
    scan, customer/nation broadcast, and the top-k is
    TakeOrderedAndProject over the exact scaled-BIGINT revenue with
    c_custkey as tie-break — deterministic under any partitioning."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.year("o_orderdate") == 1997) & (F.quarter("o_orderdate") == 1)
    ).select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@query(
    "q12_ship_latency_priority",
    oracle="""
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) < 30 THEN 'FAST'
                WHEN date_diff('day', o_orderdate, l_shipdate) < 90 THEN 'MEDIUM'
                ELSE 'SLOW' END AS ship_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE year(l_shipdate) = 1998
    GROUP BY 1
    """,
)
def q12_ship_latency_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional priority counts per shipping bucket.
    This schema has no l_shipmode/commitdate/receiptdate, so the mode
    is replaced by an order-to-ship latency bucket (<30d FAST, <90d
    MEDIUM, else SLOW) — same plan shape: one fact-fact equi-join on
    orderkey, map-side CASE counts, 3-row result. Both engines diff the
    DATE parts of midnight timestamps, so the buckets agree exactly."""
    li = _t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1998)
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .withColumn(
            "ship_bucket",
            F.when(delay < 30, "FAST").when(delay < 90, "MEDIUM").otherwise("SLOW"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "q13_order_count_histogram",
    oracle="""
    WITH co AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count, count(*) AS custdist
    FROM co GROUP BY 1
    """,
)
def q13_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count, with a
    filter ON the outer join (not WHERE — customers with zero qualifying
    orders must survive with c_count = 0; the reference pattern filters
    the comment column, here o_orderpriority). Two aggregates: per-
    customer count after a right-broadcast outer join (customer is the
    small side — Spark picks broadcast for the LEFT side preserved
    join), then the histogram roll-up, which is tiny."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    co = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))

@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                             AS BIGINT)) AS DOUBLE) / 10000.0 AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier via a max-of-aggregate scalar
    subquery). The revenue view aggregates one quarter of lineitem per
    supplier; the max is reduced to a 1-row frame and broadcast back
    with crossJoin(broadcast(...)) — the same scalar pattern as
    a1_global_minmax, so no global single-partition window and no
    driver collect. Equality on revenue is safe because both sides sum
    scaled BIGINTs (exact at 4 decimals) and divide once. Supplier
    names attach AFTER the winner filter, so the dimension join touches
    only the winning row(s)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dec_sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 4).alias(
            "total_revenue"
        )
    )
    top = rev.agg(F.max("total_revenue").alias("_max_rev"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    winners = rev.crossJoin(F.broadcast(top)).filter(
        F.col("total_revenue") == F.col("_max_rev")
    )
    return winners.join(
        F.broadcast(s), winners["supplier_no"] == s["s_suppkey"]
    ).select("s_suppkey", "s_name", "total_revenue")


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of brand/size/quantity
    conjunctions. The disjunction straddles both tables, so it cannot be
    a join predicate — but its part-side projection (brand IN the three
    values AND size in the union range) and lineitem-side projection
    (quantity in the union range) are both implied by the OR, so they
    are applied BEFORE the join as pushdown-able scan filters. Part
    shrinks enough to broadcast; the residual OR runs post-join on the
    already-reduced rows. One scan each, zero shuffle beyond the
    broadcast."""
    b12 = (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
    b23 = (F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
    b34 = (F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
    p = _t(spark, sf_dir, "part").filter(b12 | b23 | b34).select(
        "p_partkey", "p_brand", "p_size"
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1, 30)
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    q = F.col("l_quantity")
    keep = (
        (b12 & q.between(1, 11)) | (b23 & q.between(10, 20)) | (b34 & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(keep)
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT CASE WHEN l_shipdate > o_orderdate
                                        + INTERVAL 60 DAY
                                   THEN l_suppkey END) AS n_late_supp,
               max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                        THEN l_suppkey END) AS late_supp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name, count(*) AS numwait
    FROM per_order JOIN supplier ON late_supp = s_suppkey
    WHERE n_supp > 1 AND n_late_supp = 1
    GROUP BY 1, 2
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who alone delayed a multi-supplier
    order). Classic formulations use EXISTS + NOT EXISTS correlated
    subqueries = two extra scans of lineitem; here both existence tests
    collapse into ONE per-order aggregate over a single lineitem scan:
    n_supp>1 encodes the EXISTS (another supplier on the order),
    n_late_supp=1 encodes the NOT EXISTS (no OTHER late supplier), and
    the lone late supplier is recovered as max(CASE WHEN late). This
    schema has no commit/receipt dates, so "late" is ship > order date
    + 60 days. One shuffle on orderkey, one tiny agg on suppkey, the
    orders filter pushes to its scan, supplier broadcast at the end."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60
    late_key = F.when(late, F.col("l_suppkey"))
    per_order = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(late_key).alias("n_late_supp"),
            F.max(late_key).alias("late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.join(F.broadcast(s), per_order["late_supp"] == s["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q22_idle_rich_customers",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / (100.0 * count(*)) AS abal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment,
           count(*) AS numcust,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
           / 100.0 AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > abal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= DATE '2000-01-01')
    GROUP BY 1
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (well-funded customers who never ordered). Three
    classic sub-shapes in one: a scalar subquery (global average of
    positive balances — reduced to a 1-row frame and broadcast, exact
    scaled-BIGINT average so the > comparison is bit-identical across
    engines), an anti join against recent orders (the NOT EXISTS — "no
    orders since 2000"; Spark's left_anti, with the date filter pushed
    to the orders scan before the shuffle), and a final tiny rollup by
    market segment (stand-in for the country-code substring this schema
    lacks)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        dec_avg("c_acctbal", 2).alias("abal")
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    ).select("o_custkey")
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("abal"))
    idle = rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        dec_sum("c_acctbal", 2).alias("totacctbal"),
    )

@query(
    "text_repetition_metrics",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\s+') END AS t
        FROM documents
    ), uni AS (
        SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(t)) AS BIGINT) AS n_types
        FROM toks
    ), big AS (
        SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bigram_n
        FROM (
            SELECT doc_id, g, count(*) AS c
            FROM (SELECT doc_id,
                         unnest(list_transform(range(1, len(t)),
                                i -> array_to_string(list_slice(t, i, i + 1), ' '))) AS g
                  FROM toks WHERE len(t) >= 2)
            GROUP BY doc_id, g)
        GROUP BY doc_id
    ), tri AS (
        SELECT doc_id, SUM(c) AS n_trigrams, SUM(c) - count(*) AS dup_trigram_n
        FROM (
            SELECT doc_id, g, count(*) AS c
            FROM (SELECT doc_id,
                         unnest(list_transform(range(1, len(t) - 1),
                                i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS g
                  FROM toks WHERE len(t) >= 3)
            GROUP BY doc_id, g)
        GROUP BY doc_id
    )
    SELECT uni.doc_id, n_tokens,
           CASE WHEN n_tokens > 0
                THEN CAST(n_types AS DOUBLE) / n_tokens ELSE 0.0 END
               AS type_token_ratio,
           CASE WHEN n_bigrams IS NOT NULL AND n_bigrams > 0
                THEN CAST(top_bigram_n AS DOUBLE) / n_bigrams ELSE 0.0 END
               AS top_bigram_frac,
           CASE WHEN n_trigrams IS NOT NULL AND n_trigrams > 0
                THEN CAST(dup_trigram_n AS DOUBLE) / n_trigrams ELSE 0.0 END
               AS dup_trigram_frac
    FROM uni LEFT JOIN big USING (doc_id) LEFT JOIN tri USING (doc_id)
    """,
)
def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (type/token ratio, top-bigram
    share, duplicated-trigram share) — see operators/textquality.py for
    the scale contract (explode->two-level count, no per-doc arrays)."""
    from usgs_lidar_spark.operators.textquality import repetition_metrics

    return repetition_metrics(_t(spark, sf_dir, "documents"))


@query(
    "doc_chunking",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\s+') END AS t
        FROM documents
    ), starts AS (
        SELECT doc_id, t, unnest(range(0, len(t), 24)) AS start_tok
        FROM toks WHERE len(t) > 0
    )
    SELECT doc_id,
           CAST(start_tok // 24 AS BIGINT) AS chunk_id,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(len(list_slice(t, start_tok + 1, start_tok + 32)) AS BIGINT)
               AS n_chunk_tokens,
           array_to_string(list_slice(t, start_tok + 1, start_tok + 32), ' ')
               AS chunk_text
    FROM starts
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunker (32-token chunks, stride 24) —
    map-only sequence+posexplode+slice, the standard RAG/training split.
    See operators/textquality.py::chunk_documents."""
    from usgs_lidar_spark.operators.textquality import chunk_documents

    return chunk_documents(_t(spark, sf_dir, "documents"), 32, 24)


@query(
    "text_corpus_freq_score",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents WHERE trim(text) <> ''
    ), counts AS (
        SELECT w, count(*) AS cnt FROM tok GROUP BY w
    )
    SELECT doc_id,
           count(*) AS n_tokens,
           CAST(SUM(cnt) AS DOUBLE) / count(*) AS mean_token_count,
           CAST(SUM(CASE WHEN cnt < 3 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
               AS rare_frac
    FROM tok JOIN counts USING (w)
    GROUP BY doc_id
    """,
)
def text_corpus_freq_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-rarity scoring with the Zipf-head skew handled by a
    two-tier lookup (broadcast hot vocab, shuffle only the tail) —
    integer-exact, see operators/textquality.py::corpus_freq_score."""
    from usgs_lidar_spark.operators.textquality import corpus_freq_score

    return corpus_freq_score(_t(spark, sf_dir, "documents"))

@query(
    "events_click_purchase_pairs",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           strftime(date_trunc('microseconds', c.ts),
                    '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           strftime(date_trunc('microseconds', p.ts),
                    '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def events_click_purchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: every (click, purchase) pair for the same user with
    the purchase inside [click, click + 30min] — the batch twin of
    streaming/events.py::click_purchase_join_stream, which runs the same
    predicate as a watermarked stream-stream join. The join is equi on
    user_id (one hash shuffle; the time range is a post-join residual),
    so it scales like any keyed join — never a cartesian. Both sides
    prune to their event_type at the scan."""
    e = _t(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    c = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    j = c.join(
        p,
        (c["user_id"] == p["p_user"])
        & (p["p_ts"] >= c["c_ts"])
        & (p["p_ts"] <= c["c_ts"] + F.expr("INTERVAL 30 MINUTES")),
    )
    return j.select(
        "user_id",
        "click_id",
        "purchase_id",
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
    )

@query(
    "events_cohort_retention",
    oracle="""
    WITH cohort AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        FROM events WHERE event_type = 'signup'
        GROUP BY 1
    ), sizes AS (
        SELECT cohort_day, count(*) AS cohort_n FROM cohort GROUP BY 1
    ), active AS (
        SELECT DISTINCT e.user_id, c.cohort_day,
               date_diff('day', c.cohort_day, CAST(e.ts AS DATE)) AS day_offset
        FROM events e JOIN cohort c ON e.user_id = c.user_id
        WHERE CAST(e.ts AS DATE) >= c.cohort_day
    )
    SELECT strftime(a.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(a.day_offset AS BIGINT) AS day_offset,
           count(*) AS n_active,
           s.cohort_n,
           CAST(count(*) AS DOUBLE) / s.cohort_n AS retention
    FROM active a JOIN sizes s ON a.cohort_day = s.cohort_day
    GROUP BY a.cohort_day, a.day_offset, s.cohort_n
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users cohorted by first-signup day, then
    counted once per (cohort, day-offset) where they show ANY activity on
    or after the cohort day. The cohort anchor is a per-user min (one
    shuffle on user_id), the activity join meets it on the same key, the
    distinct re-keys by (user, cohort, offset) and the matrix rollup by
    (cohort, offset) — all keys of strictly shrinking cardinality, with
    the tiny cohort-size table broadcast at the end. The retention ratio
    is int/int division — exact on both engines."""
    e = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    cohort = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").cast("date").alias("cohort_day"))
    )
    sizes = cohort.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("cohort_n"))
    active = (
        e.join(cohort, "user_id")
        .filter(F.col("ts").cast("date") >= F.col("cohort_day"))
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .distinct()
    )
    return (
        active.groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.col("day_offset").cast("long").alias("day_offset"),
            "n_active",
            "cohort_n",
            (F.col("n_active").cast("double") / F.col("cohort_n")).alias("retention"),
        )
    )

@query(
    "dedup_minhash_incremental",
    oracle=f"""
    WITH {_SHINGLE_CTE}
    SELECT id_a, id_b, jaccard,
           CASE WHEN id_a % 10 = 0 AND id_b % 10 = 0 THEN 'batch_batch'
                ELSE 'corpus_batch' END AS pair_type
    FROM jac
    WHERE jaccard >= 0.6 AND (id_a % 10 = 0 OR id_b % 10 = 0)
    """,
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash-LSH: near-dup pairs involving the newest 10%
    of docs (doc_id % 10 == 0 plays the incoming batch) against the
    ingested corpus — batch bands probe the band index, corpus x corpus
    is never recomputed, corpus text only verifies actual collisions.
    Oracle = exact Jaccard restricted to batch-involving pairs (the same
    ~6e-7 band-miss bound as dedup_minhash_lsh)."""
    from usgs_lidar_spark.operators.dedup import minhash_lsh_pairs_incremental

    d = _t(spark, sf_dir, "documents").withColumn(
        "is_batch", F.col("doc_id") % 10 == 0
    )
    return minhash_lsh_pairs_incremental(
        d, "text", "doc_id", "is_batch",
        k=8, num_perm=64, bands=32, threshold=0.6, max_df=20,
    )

@query(
    "cdc_attribute_history",
    oracle="""
    SELECT user_id,
           strftime(date_trunc('microseconds', ts),
                    '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           strftime(date_trunc('microseconds',
                    lead(ts) OVER w), '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
           lead(ts) OVER w IS NULL AS is_current,
           event_type, value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def cdc_attribute_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 interval-ization of the event log: each per-user observation
    is valid until the next one (operators/cdc.attribute_history — one
    window keyed by user, no self-join). event_id breaks equal-ts ties
    deterministically."""
    from usgs_lidar_spark.operators.cdc import attribute_history

    h = attribute_history(
        _t(spark, sf_dir, "events"),
        "user_id", "ts", ["event_type", "value"], tie_col="event_id",
    )
    return h.select(
        "user_id",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "valid_from"
        ),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_to"),
        "is_current",
        "event_type",
        "value",
    )


@query(
    "cdc_apply_changelog",
    oracle="""
    WITH log AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               value
        FROM events
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM log
    )
    SELECT user_id,
           strftime(date_trunc('microseconds', ts),
                    '%Y-%m-%d %H:%M:%S.%f') AS ts,
           value
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC collapse: last-writer-wins per user with deletes — 'error'
    events play the tombstones. operators/cdc.apply_changelog uses
    max_by over a (ts, event_id) struct — a partial-aggregating hash
    agg, so hot keys pre-combine map-side instead of sorting a window
    buffer (the row_number formulation the oracle uses)."""
    from usgs_lidar_spark.operators.cdc import apply_changelog

    log = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        "value",
    )
    cur = apply_changelog(log, "user_id", "ts", "op", ["value"], tie_col="event_id")
    return cur.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "value",
    )


@query(
    "cdc_snapshot_diff",
    oracle="""
    WITH l AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
    ), r AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 13 = 0
                    THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % 17 <> 0
        UNION ALL
        SELECT o_orderkey + 100000000, 42.0, 'N'
        FROM orders WHERE o_orderkey % 19 = 0
    )
    SELECT coalesce(l.o_orderkey, r.o_orderkey) AS o_orderkey,
           CASE WHEN l.o_orderkey IS NULL THEN 'added'
                WHEN r.o_orderkey IS NULL THEN 'removed'
                WHEN l.o_totalprice <> r.o_totalprice
                  OR l.o_orderstatus <> r.o_orderstatus THEN 'changed'
           END AS status
    FROM l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey
    WHERE CASE WHEN l.o_orderkey IS NULL THEN 'added'
               WHEN r.o_orderkey IS NULL THEN 'removed'
               WHEN l.o_totalprice <> r.o_totalprice
                 OR l.o_orderstatus <> r.o_orderstatus THEN 'changed'
          END IS NOT NULL
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: the 'next day' snapshot is simulated from
    orders (every 17th key dropped, every 13th repriced, every 19th
    reborn under a new key), and operators/cdc.snapshot_diff reports
    added/removed/changed keys. The engine compares one map-side
    xxhash64 per row — the oracle compares the payload columns directly,
    so agreement also demonstrates the hash reduction loses nothing."""
    from usgs_lidar_spark.operators.cdc import snapshot_diff

    left = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    base = left.filter(F.col("o_orderkey") % 17 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderstatus",
    )
    born = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 19 == 0)
        .select(
            (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
            F.lit(42.0).alias("o_totalprice"),
            F.lit("N").alias("o_orderstatus"),
        )
    )
    right = base.unionByName(born)
    return snapshot_diff(
        left, right, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )

@query(
    "rollup_incremental_refresh",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS total_price,
           count(*) AS n_orders,
           min(o_orderdate) AS first_order,
           max(o_orderdate) AS last_order
    FROM orders GROUP BY 1, 2
    """,
)
def rollup_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: history (orders before 2000) is
    aggregated into stored mergeable state, the 'new arrivals' (2000+)
    into batch state, and merge_rollup combines them — the oracle
    aggregates everything from scratch, so hash equality PROVES the
    algebraic merge is exact (the scaled-BIGINT sums make even the
    double sums order-independent). Refresh cost is O(batch + rollup),
    never O(history) — see operators/rollup.py."""
    from usgs_lidar_spark.operators.rollup import merge_rollup, rollup_state

    keys = ["o_orderstatus", "o_orderpriority"]
    measures = [
        ("o_totalprice", "sum"),
        ("o_totalprice", "count"),
        ("o_orderdate", "min"),
        ("o_orderdate", "max"),
    ]
    o = _t(spark, sf_dir, "orders")
    hist = o.filter(F.col("o_orderdate") < "2000-01-01")
    batch = o.filter(F.col("o_orderdate") >= "2000-01-01")
    stored = rollup_state(hist, keys, measures)
    fresh = merge_rollup(stored, rollup_state(batch, keys, measures), keys, measures)
    return fresh.select(
        *keys,
        (F.col("o_totalprice_sum").cast("double") / 100.0).alias("total_price"),
        F.col("o_totalprice_count").alias("n_orders"),
        F.col("o_orderdate_min").alias("first_order"),
        F.col("o_orderdate_max").alias("last_order"),
    )


@query(
    "topk_per_group_parts",
    oracle="""
    WITH ranked AS (
        SELECT p_brand, p_partkey, p_name, p_retailprice,
               row_number() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice DESC, p_partkey) AS rk
        FROM part
    )
    SELECT p_brand, CAST(rk AS INTEGER) AS rk, p_partkey, p_name, p_retailprice
    FROM ranked WHERE rk <= 3
    """,
)
def topk_per_group_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (3 priciest parts per brand): one window keyed by
    brand with a deterministic (price desc, partkey) order, filtered on
    row_number — the rank never materializes beyond each partition's
    sort, and no global TakeOrdered is involved, so k-per-group scales
    with groups, not with a single driver-side top list."""
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        _t(spark, sf_dir, "part")
        .select(
            "p_brand",
            F.row_number().over(w).alias("rk"),
            "p_partkey",
            "p_name",
            "p_retailprice",
        )
        .filter(F.col("rk") <= 3)
        .select("p_brand", "rk", "p_partkey", "p_name", "p_retailprice")
    )

@query(
    "dq_violation_report",
    oracle="""
    SELECT 'unique(o_orderkey)' AS constraint,
           CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n - 1 END), 0) AS BIGINT)
               AS violations,
           CAST(SUM(n) AS BIGINT) AS checked
    FROM (SELECT o_orderkey, count(*) AS n FROM orders GROUP BY 1)
    UNION ALL
    SELECT 'not_null(o_custkey)',
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(*)
    FROM orders
    UNION ALL
    SELECT 'not_null(o_orderdate)',
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(*)
    FROM orders
    UNION ALL
    SELECT 'foreign_key(o_custkey)',
           CAST(count(*) FILTER (WHERE c_custkey IS NULL) AS BIGINT),
           count(*)
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    WHERE o_custkey IS NOT NULL
    UNION ALL
    SELECT 'range(o_totalprice in [0.0,1000000.0])',
           CAST(SUM(CASE WHEN o_totalprice IS NULL
                          OR o_totalprice < 0.0
                          OR o_totalprice > 1000000.0 THEN 1 ELSE 0 END)
                AS BIGINT),
           count(*)
    FROM orders
    """,
)
def dq_violation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-promotion data-quality gate over orders: key uniqueness,
    completeness, referential integrity to customer, and a price range
    — each check an aggregate or anti-join producing a (constraint,
    violations, checked) summary row; no violating rows ship with the
    report (operators/dq.py)."""
    from usgs_lidar_spark.operators import dq

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return dq.dq_report(
        [
            dq.check_unique(o, ["o_orderkey"]),
            dq.check_not_null(o, ["o_custkey", "o_orderdate"]),
            dq.check_foreign_key(o, "o_custkey", c, "c_custkey"),
            dq.check_in_range(o, "o_totalprice", 0.0, 1000000.0),
        ]
    )

@query(
    "pipe_target_mix",
    oracle="""
    WITH w(lang, wt) AS (VALUES ('en', 6), ('de', 2), ('fr', 1)),
    counts AS (
        SELECT d.lang, count(*) AS n, any_value(wt) AS wt
        FROM documents d JOIN w ON d.lang = w.lang
        GROUP BY d.lang
    ), m AS (
        SELECT min((n * 9) // wt) AS m FROM counts
    ), quota AS (
        SELECT lang, (wt * m) // 9 AS k FROM counts, m
    ), ranked AS (
        SELECT d.doc_id, d.lang, q.k,
               row_number() OVER (
                   PARTITION BY d.lang
                   ORDER BY ((((doc_id % 2147483647) + 1) % 2147483647)
                             * 48271 % 2147483647) * 48271 % 2147483647,
                            doc_id) AS rk
        FROM documents d JOIN quota q ON d.lang = q.lang
    )
    SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM ranked WHERE rk <= k GROUP BY lang
    """,
)
def pipe_target_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: downsample documents to a 6:2:1 en:de:fr target (zh/es
    dropped — no weight) keeping the largest exactly-proportioned subset;
    integer quota math + deterministic Lehmer order make the kept SET
    itself reproducible on any engine (id_sum pins membership, not just
    counts). See operators/pipeline.resample_to_mix."""
    from usgs_lidar_spark.operators.pipeline import resample_to_mix

    kept = resample_to_mix(
        _t(spark, sf_dir, "documents"), "lang", {"en": 6, "de": 2, "fr": 1},
        "doc_id",
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("id_sum"),
    )

@query(
    "a9_group_median",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(CAST(ROUND(l_extendedprice * 100) AS BIGINT), 0.5)
               / 100.0 AS median_price,
           quantile_cont(CAST(ROUND(l_quantity) AS BIGINT), 0.5) AS median_qty,
           count(*) AS n
    FROM lineitem GROUP BY 1
    """,
)
def a9_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group median (vs the approx_percentile sketch path in
    sketch_approx_stats): Spark's `percentile` aggregate with linear
    interpolation, computed over cents-scaled integers so the midpoint
    average of two longs is exactly representable and both engines emit
    the identical double. Exact percentiles sort each group's values —
    the per-group-sort cost approx_percentile exists to avoid; this is
    the ground-truth form you run on the slice where exactness matters,
    not the default at 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    qty = F.round(F.col("l_quantity")).cast("long")
    return li.groupBy("l_returnflag").agg(
        (F.percentile(cents, F.lit(0.5)) / 100.0).alias("median_price"),
        F.percentile(qty, F.lit(0.5)).alias("median_qty"),
        F.count(F.lit(1)).alias("n"),
    )

@query(
    "nearest_purchase_to_click",
    oracle="""
    WITH c AS (
        SELECT event_id AS click_id, user_id, ts AS c_ts
        FROM events WHERE event_type = 'click'
    ), p AS (
        SELECT event_id, user_id, ts AS p_ts
        FROM events WHERE event_type = 'purchase'
    ), cand AS (
        SELECT c.click_id, c.user_id, c.c_ts, p.event_id, p.p_ts,
               date_diff('microsecond', c.c_ts, p.p_ts) AS dt
        FROM c JOIN p ON c.user_id = p.user_id
        WHERE abs(date_diff('microsecond', c.c_ts, p.p_ts)) <= 1800000000
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY click_id
                                     ORDER BY abs(dt), p_ts, event_id) AS rk
        FROM cand
    )
    SELECT user_id, click_id,
           strftime(date_trunc('microseconds', c_ts),
                    '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           strftime(date_trunc('microseconds', p_ts),
                    '%Y-%m-%d %H:%M:%S.%f') AS nearest_ts,
           event_id AS nearest_event_id,
           CAST(dt AS BIGINT) AS nearest_dt
    FROM ranked WHERE rk = 1
    """,
)
def nearest_purchase_to_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event join: each click matched to the user's closest
    purchase within ±30 minutes, past preferred on exact ties
    (operators/asof.nearest_join — one shuffle, two windows, never a
    range-join explosion; the oracle IS the range-join formulation, so
    agreement proves the two-candidate reduction exact)."""
    from usgs_lidar_spark.operators.asof import nearest_join

    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    j = nearest_join(
        clicks, purchases, ["user_id"], "ts", ["event_id"],
        tolerance=1_800_000_000, tie_break="event_id",
    )
    return j.select(
        "user_id",
        "click_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        F.date_format("nearest_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "nearest_ts"
        ),
        "nearest_event_id",
        "nearest_dt",
    )

@query(
    "mm_audio_rms",
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id,
               list_transform(range(1, length(text) + 1),
                   i -> CAST(ord(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT)
                        - 128) AS s
        FROM documents
    ), win AS (
        SELECT media_id, s,
               unnest(range(0, len(s), 64)) AS k
        FROM m WHERE len(s) > 0
    )
    SELECT media_id,
           CAST(k // 64 AS BIGINT) AS window_index,
           CAST(len(list_slice(s, k + 1, k + 64)) AS BIGINT) AS n_samples,
           sqrt(CAST(list_sum(list_transform(list_slice(s, k + 1, k + 64),
                                             x -> x * x)) AS DOUBLE)
                / len(list_slice(s, k + 1, k + 64))) AS rms
    FROM win
    """,
)
def mm_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS energy over 'audio' payloads (documents' bytes as
    8-bit PCM, the deterministic decode stand-in): one-to-many
    mapInPandas with int64-exact sums of squares and one IEEE sqrt, so
    both engines emit identical doubles. See
    multimodal/binary_ops.audio_rms_windows. (ASCII payloads make the
    oracle's per-char ord() equal the byte values.)"""
    from usgs_lidar_spark.multimodal import audio_rms_windows, to_media_table

    d = _t(spark, sf_dir, "documents")
    media = to_media_table(d, "doc_id", "text")
    return audio_rms_windows(media, window=64)

@query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           count(*) AS n,
           CAST(count(*) AS DOUBLE)
               / sum(count(*)) OVER (PARTITION BY event_type) AS p
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavior model: the event-type transition matrix with
    per-source-state probabilities. One lag/lead window per user (the
    sequence), a (from, to) count, and a tiny window over the 25-cell
    matrix for row-normalization — the shuffles are user-keyed then
    matrix-keyed, both fine at any scale. Count ratios are int/int in
    one division, so probabilities hash identically."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    counts = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wrow = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wrow)).alias("p"),
    )


@query(
    "skew_report_lineitem",
    oracle="""
    WITH counts AS (
        SELECT l_suppkey AS key, count(*) AS n FROM lineitem GROUP BY 1
    ), stats AS (
        SELECT count(*) AS n_keys,
               CAST(SUM(n) AS BIGINT) AS n_rows,
               CAST(MAX(n) AS BIGINT) AS max_n,
               quantile_cont(n, 0.5) AS p50,
               quantile_cont(n, 0.99) AS p99
        FROM counts
    )
    SELECT n_keys, n_rows, max_n, p50, p99,
           max_n / (CAST(n_rows AS DOUBLE) / n_keys) AS max_over_mean
    FROM stats
    """,
)
def skew_report_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnostic for a prospective join/agg key: per-key
    row counts reduced to (n_keys, max, exact p50/p99, max/mean) — the
    numbers that tell you whether l_suppkey needs salting BEFORE you pay
    for the skewed shuffle. The count table is one hash agg; the exact
    percentiles sort only the per-key counts (key-cardinality sized,
    not row-sized)."""
    counts = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_suppkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
        F.percentile("n", F.lit(0.5)).alias("p50"),
        F.percentile("n", F.lit(0.99)).alias("p99"),
    ).select(
        "n_keys",
        "n_rows",
        "max_n",
        "p50",
        "p99",
        (
            F.col("max_n") / (F.col("n_rows").cast("double") / F.col("n_keys"))
        ).alias("max_over_mean"),
    )

@query(
    "events_user_trend",
    oracle="""
    WITH base AS (
        SELECT user_id,
               epoch_us(ts) // 1000000 AS ts_s,
               CAST(ROUND(value * 100) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL
    ), reb AS (
        SELECT user_id,
               ts_s - min(ts_s) OVER (PARTITION BY user_id) AS t, v
        FROM base
    ), s AS (
        -- sums stay HUGEINT (DuckDB's SUM(BIGINT)) so the normal-equation
        -- products below cannot overflow; they only narrow to DOUBLE at
        -- the final division, exactly like the Python side's exact ints
        SELECT user_id, count(*) AS n,
               SUM(t) AS st, SUM(v) AS sv,
               SUM(t * t) AS stt,
               SUM(t * v) AS stv
        FROM reb GROUP BY 1
    )
    SELECT user_id, n,
           CASE WHEN n < 2 OR n * stt - st * st = 0 THEN NULL
                ELSE (CAST(n * stv - st * sv AS DOUBLE)
                      / CAST(n * stt - st * st AS DOUBLE)) * 3600.0 / 100.0
           END AS slope_per_hour,
           CASE WHEN n < 2 OR n * stt - st * st = 0
                THEN (CAST(sv AS DOUBLE) / n) / 100.0
                ELSE (CAST(sv * stt - st * stv AS DOUBLE)
                      / CAST(n * stt - st * st AS DOUBLE)) / 100.0
           END AS intercept
    FROM s
    """,
)
def events_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS value trend through applyInPandas (the grouped-map
    UDF shape): normal equations on int64-exact per-group sums, one
    double division at the end — a Python-UDF query the oracle can
    hash-compare bit-for-bit (operators/grouped.py documents the
    float-before-divide rule that makes that possible)."""
    from usgs_lidar_spark.operators.grouped import user_value_trend

    return user_value_trend(_t(spark, sf_dir, "events"))

@query(
    "text_top_terms",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        FROM documents WHERE trim(text) <> ''
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
    ), df AS (
        SELECT term, count(*) AS df FROM tf GROUP BY 1
    ), n AS (
        SELECT count(DISTINCT doc_id) AS n_docs FROM tok
    ), scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               tf.tf * (CAST(n.n_docs AS DOUBLE) / df.df) AS lift
        FROM tf JOIN df USING (term), n
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY lift DESC, term) AS rk
        FROM scored
    )
    SELECT doc_id, CAST(rk AS INTEGER) AS rk, term,
           CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, lift
    FROM ranked WHERE rk <= 3
    """,
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: top-3 terms per document by TF-lift
    (tf x N/df — the log-free TF-IDF ordering; ln() would break
    cross-engine hash equality and is monotone-equivalent for ranking
    within a fixed tf). Term frequencies shuffle on (doc, term),
    document frequencies on term (Zipf-head skew is benign here — df is
    a count-only aggregate with map-side partial combine, unlike the
    row-carrying lookup join corpus_freq_score de-skews), and the scalar
    doc count broadcasts. Deterministic (lift desc, term) tie-break."""
    d = _t(spark, sf_dir, "documents")
    from usgs_lidar_spark.functions.textstats import ws_tokens

    tok = d.select("doc_id", F.explode(ws_tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = tok.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "lift", F.col("tf") * (F.col("n_docs").cast("double") / F.col("df"))
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("lift").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "rk", "term", "tf", "df", "lift")
    )

@query(
    "w3_first_last_nth",
    oracle="""
    SELECT event_id, user_id,
           first_value(value) OVER w AS first_v,
           last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND UNBOUNDED FOLLOWING) AS last_v,
           nth_value(value, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING) AS third_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w3_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The value-positional window family with the frame trap handled
    explicitly: last_value/nth_value over the DEFAULT frame (unbounded
    preceding..current row) would return the running last/3rd — the
    full-partition frame must be spelled out, while first_value is
    frame-insensitive for this ordering. One user-keyed window sort
    serves all three."""
    w_default = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w_default.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.first("value").over(w_default).alias("first_v"),
        F.last("value").over(w_full).alias("last_v"),
        F.nth_value("value", 3).over(w_full).alias("third_v"),
    )

@query(
    "events_dau_wau",
    oracle="""
    WITH days AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d FROM events
    ), day_users AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ), dau AS (
        SELECT d, count(*) AS dau FROM day_users GROUP BY 1
    ), wau AS (
        SELECT days.d, count(DISTINCT du.user_id) AS wau
        FROM days JOIN day_users du
          ON du.d <= days.d AND du.d > days.d - INTERVAL 7 DAY
        GROUP BY 1
    )
    SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau.dau, wau.wau,
           CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
    FROM dau JOIN wau ON dau.d = wau.d
    """,
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement: daily actives, trailing-7-day actives, and stickiness
    (DAU/WAU). The trailing distinct is THE trap here — count(DISTINCT)
    over a RANGE window is unsupported/incorrect, so the rolling set is
    computed by joining the day grid to per-day distinct users within
    the 7-day interval: the join fans each (day, user) row to <= 7 grid
    days, then a count-distinct per day — fan-out bounded by the window
    length, never quadratic. Inputs to both aggregates share one
    (day, user) distinct pass."""
    e = _t(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("d"), "user_id"
    )
    day_users = e.distinct()
    days = day_users.select("d").distinct()
    dau = day_users.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    g = days.alias("g")
    du = day_users.alias("du")
    wau = (
        g.join(
            du,
            (F.col("du.d") <= F.col("g.d"))
            & (F.col("du.d") > F.date_sub(F.col("g.d"), 7)),
        )
        .groupBy(F.col("g.d").alias("d"))
        .agg(F.countDistinct("du.user_id").alias("wau"))
    )
    return (
        dau.join(wau, "d")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


@query(
    "customer_rfm",
    oracle="""
    WITH base AS (
        SELECT o_custkey,
               max(o_orderdate) AS last_order,
               count(*) AS frequency,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS monetary
        FROM orders GROUP BY 1
    ), scored AS (
        SELECT o_custkey, last_order, frequency, monetary,
               ntile(5) OVER (ORDER BY last_order, o_custkey) AS r_score,
               ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
               ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_score
        FROM base
    )
    SELECT CAST(r_score AS INTEGER) AS r_score,
           CAST(f_score AS INTEGER) AS f_score,
           CAST(m_score AS INTEGER) AS m_score,
           count(*) AS n_customers,
           CAST(SUM(CAST(ROUND(monetary * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS segment_value
    FROM scored GROUP BY 1, 2, 3
    """,
)
def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary rolled
    into quintile scores (ntile with a custkey tie-break so bucket edges
    are deterministic), then segment sizes and value. The three ntiles
    are global windows over the per-customer AGGREGATE (customer-
    cardinality rows, not orders) — the standard caveat: a global ntile
    single-partitions that frame, fine for dimension-sized inputs,
    replaced by range-bucketed approximations if customers outgrow one
    partition's sort."""
    base = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            dec_sum("o_totalprice", 2).alias("monetary"),
        )
    )
    scored = base.select(
        "o_custkey",
        "monetary",
        F.ntile(5).over(Window.orderBy("last_order", "o_custkey")).alias("r_score"),
        F.ntile(5).over(Window.orderBy("frequency", "o_custkey")).alias("f_score"),
        F.ntile(5).over(Window.orderBy("monetary", "o_custkey")).alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dec_sum("monetary", 2).alias("segment_value"),
    )

@query(
    "unpivot_status_measures",
    oracle="""
    WITH agg AS (
        SELECT o_orderstatus,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS total_price,
               CAST(count(*) AS DOUBLE) AS n_orders,
               CAST(count(DISTINCT o_custkey) AS DOUBLE) AS n_customers
        FROM orders GROUP BY 1
    )
    SELECT o_orderstatus, 'total_price' AS measure, total_price AS value
    FROM agg
    UNION ALL
    SELECT o_orderstatus, 'n_orders', n_orders FROM agg
    UNION ALL
    SELECT o_orderstatus, 'n_customers', n_customers FROM agg
    """,
)
def unpivot_status_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long (UNPIVOT): the per-status measure columns melt into
    (measure, value) rows with stack() — the inverse of
    pivot_status_by_segment, and a map-side expression over the tiny
    aggregate (the oracle's UNION ALL re-reads the CTE three times;
    stack emits all three rows in one pass)."""
    agg = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            dec_sum("o_totalprice", 2).alias("total_price"),
            F.count(F.lit(1)).cast("double").alias("n_orders"),
            F.countDistinct("o_custkey").cast("double").alias("n_customers"),
        )
    )
    return agg.select(
        "o_orderstatus",
        F.expr(
            "stack(3, 'total_price', total_price, 'n_orders', n_orders, "
            "'n_customers', n_customers) AS (measure, value)"
        ),
    )

@query(
    "spatial_join_points_regions",
    oracle="""
    WITH pts AS (
        SELECT l_orderkey, l_linenumber,
               l_extendedprice AS x, l_quantity * 1000 AS y
        FROM lineitem WHERE l_linenumber = 1
    ), dia AS (
        SELECT r_regionkey AS poly_id,
               15000.0 + 12000.0 * r_regionkey AS cx,
               10000.0 + 6000.0 * r_regionkey AS cy,
               8000.0 AS a, 5000.0 AS b
        FROM region
    )
    SELECT p.l_orderkey, p.l_linenumber, d.poly_id
    FROM pts p JOIN dia d
      ON abs(p.x - d.cx) / d.a + abs(p.y - d.cy) / d.b <= 1.0
    """,
)
def spatial_join_points_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial join: first-line lineitem 'points' (price, 1000*qty)
    against one convex diamond per region — grid-bucketed candidates
    (cell equi-join) + exact containment, vs the oracle's direct theta
    join. Agreement proves the bucketing loses and invents nothing.
    operators/spatial.spatial_join_points_diamonds."""
    from usgs_lidar_spark.operators.spatial import spatial_join_points_diamonds

    pts = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").alias("x"),
        (F.col("l_quantity") * 1000).alias("y"),
    )
    dia = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("poly_id"),
        (15000.0 + 12000.0 * F.col("r_regionkey")).alias("cx"),
        (10000.0 + 6000.0 * F.col("r_regionkey")).alias("cy"),
        F.lit(8000.0).alias("a"),
        F.lit(5000.0).alias("b"),
    )
    j = spatial_join_points_diamonds(pts, dia, cell=4000.0)
    return j.select("l_orderkey", "l_linenumber", "poly_id")

@query(
    "nearest_station_join",
    oracle="""
    WITH pts AS (
        SELECT l_orderkey, l_linenumber,
               l_extendedprice AS x, l_quantity * 1000 AS y
        FROM lineitem WHERE l_linenumber = 1
    ), sites AS (
        SELECT s_suppkey AS site_id,
               (s_suppkey * 7919) % 100000 + 0.5 AS sx,
               (s_suppkey * 104729) % 50000 + 0.5 AS sy
        FROM supplier
    ), cand AS (
        SELECT p.l_orderkey, p.l_linenumber, p.x, p.y, s.site_id,
               (p.x - s.sx) * (p.x - s.sx) + (p.y - s.sy) * (p.y - s.sy) AS d2
        FROM pts p JOIN sites s
          ON (p.x - s.sx) * (p.x - s.sx) + (p.y - s.sy) * (p.y - s.sy)
             <= 3000.0 * 3000.0
    ), ranked AS (
        -- point identity includes (x, y): the synthetic lineitem can
        -- repeat an (orderkey, linenumber) pair, and merging two distinct points
        -- into one partition would under-report matches
        SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_linenumber, x, y
                                     ORDER BY d2, site_id) AS rk
        FROM cand
    )
    SELECT l_orderkey, l_linenumber, x, y, site_id AS nearest_site_id,
           d2 AS nearest_d2
    FROM ranked WHERE rk = 1
    """,
)
def nearest_station_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-facility join: each lineitem 'point' matched to its
    closest supplier 'station' within 3000 units — 3x3 grid-cell probe
    + cell equi-join + struct-min per point (no window sort, partial
    map-side), vs the oracle's direct theta join. Deterministic
    (d2, site_id) tie-break; squared distances so no sqrt enters the
    comparison. operators/spatial.nearest_neighbor_join."""
    from usgs_lidar_spark.operators.spatial import nearest_neighbor_join

    pts = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").alias("x"),
        (F.col("l_quantity") * 1000).alias("y"),
    )
    sites = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("site_id"),
        ((F.col("s_suppkey") * 7919) % 100000 + 0.5).alias("sx"),
        ((F.col("s_suppkey") * 104729) % 50000 + 0.5).alias("sy"),
    )
    j = nearest_neighbor_join(
        pts, sites, radius=3000.0,
        site_id_col="site_id", site_x_col="sx", site_y_col="sy",
    )
    return j.select(
        "l_orderkey", "l_linenumber", "x", "y", "nearest_site_id", "nearest_d2"
    )

@query(
    "orders_overlap_pairs",
    oracle="""
    WITH iv AS (
        SELECT o_custkey, o_orderkey,
               epoch_us(o_orderdate) // 86400000000 AS s,
               epoch_us(o_orderdate) // 86400000000 + 30 AS e
        FROM orders WHERE o_orderkey % 10 = 0
    )
    SELECT a.o_custkey, a.o_orderkey, a.s, a.e,
           b.o_orderkey AS o_orderkey_r, b.s AS s_r, b.e AS e_r
    FROM iv a JOIN iv b
      ON a.o_custkey = b.o_custkey
     AND a.s < b.e AND b.s < a.e
     AND a.o_orderkey < b.o_orderkey
    """,
)
def orders_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap self-join: pairs of a customer's orders whose
    30-day activity windows overlap (re-order-while-active behavior) —
    bucketed by 30-day epochs (operators/asof.interval_overlap_join:
    explode-to-buckets + equi-join + exact predicate + distinct), vs the
    oracle's direct per-customer theta join. The a<b key filter halves
    the symmetric pairs deterministically."""
    from usgs_lidar_spark.operators.asof import interval_overlap_join

    iv = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_custkey",
            "o_orderkey",
            (
                F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                / 86400000000
            ).cast("long").alias("s"),
        )
        .withColumn("e", F.col("s") + 30)
    )
    j = interval_overlap_join(
        iv, iv, ["o_custkey"], bucket_width=30, start_col="s", end_col="e"
    )
    return j.filter(F.col("o_orderkey") < F.col("o_orderkey_r")).select(
        "o_custkey", "o_orderkey", "s", "e", "o_orderkey_r", "s_r", "e_r"
    )

@query(
    "basket_part_pairs",
    oracle="""
    WITH li AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS support
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    )
    SELECT part_a, part_b, support FROM pairs WHERE support >= 3
    """,
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing in >= 3 shared
    orders. The self-join is keyed on orderkey, so the blow-up is
    bounded by lines-per-order squared (~7^2 here, never corpus^2); the
    distinct first collapses repeated (order, part) lines so a part
    counted twice in one order cannot inflate support. The support
    filter prunes the pair tail before it is ever materialized to the
    driver — at 100 TB the pairs frame stays distributed and the
    min-support threshold is the size knob."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 3)
    )


# =====================================================================
# Range search + SQ8 scalar-quantization tier (round 5 cont.)
# =====================================================================

_SIGN_BUCKET_SQL = """CAST((CASE WHEN {e}[1] > 0 THEN 1 ELSE 0 END)
                  + (CASE WHEN {e}[2] > 0 THEN 2 ELSE 0 END)
                  + (CASE WHEN {e}[3] > 0 THEN 4 ELSE 0 END)
                  + (CASE WHEN {e}[4] > 0 THEN 8 ELSE 0 END)
                  + (CASE WHEN {e}[5] > 0 THEN 16 ELSE 0 END)
                  + (CASE WHEN {e}[6] > 0 THEN 32 ELSE 0 END)
                  + (CASE WHEN {e}[7] > 0 THEN 64 ELSE 0 END)
                  + (CASE WHEN {e}[8] > 0 THEN 128 ELSE 0 END) AS BIGINT)"""


@query(
    "sim_range_search",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 50),
    c AS (SELECT vec_id, embedding FROM embeddings),
    sims AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
        {_COSINE_SQL}
        FROM c, q WHERE c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, sim FROM sims WHERE sim >= 0.30
    """,
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact range search — all pairs with cosine >= tau (the dual of
    top-k when k is unknowable: "every semantic duplicate above 0.30").
    Broadcast query set, no window stage; each corpus partition emits
    only its over-threshold pairs, so output size (not corpus size)
    bounds the shuffle."""
    from usgs_lidar_spark.operators.similarity import cosine_range_search

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_range_search(
        emb, queries_df, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", threshold=0.30,
    )


@query(
    "sim_range_search_lsh",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, embedding,
               {_SIGN_BUCKET_SQL.format(e='embedding')} AS bucket
        FROM embeddings
    ), q AS (SELECT vec_id AS query_id, embedding AS qv, bucket
             FROM b WHERE vec_id < 50),
    c AS (SELECT vec_id, embedding, bucket FROM b),
    sims AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
        {_COSINE_SQL}
        FROM c JOIN q ON bit_count(xor(c.bucket, q.bucket)) <= 1
                     AND c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, sim FROM sims WHERE sim >= 0.30
    """,
)
def sim_range_search_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate range search: multi-probe sign-LSH candidates (home
    bucket + Hamming-1 neighbors), threshold filter on exact cosine
    within probed buckets only — each query touches ~9/256 of the corpus
    at scale. Oracle replays the identical probe set via
    bit_count(xor()) <= 1, so this pins the bucketed path exactly (its
    recall vs sim_range_search is visible as the row-count delta)."""
    from usgs_lidar_spark.operators.similarity import cosine_range_search_lsh

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_range_search_lsh(
        emb, queries_df, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", threshold=0.30, n_bits=8,
    )


@query(
    "sim_topk_sq8",
    oracle="""
    WITH pos AS (SELECT unnest(range(1, 65)) AS i),
    dims AS (
        SELECT i,
               min(CAST(embedding[i] AS DOUBLE)) AS mn,
               max(CAST(embedding[i] AS DOUBLE)) AS mx
        FROM embeddings, pos GROUP BY i
    ),
    dimarr AS (
        SELECT list(mn ORDER BY i) AS mns,
               list(CASE WHEN mx > mn THEN (mx - mn) / 255.0
                         ELSE 0.0 END ORDER BY i) AS scales
        FROM dims
    ),
    recon AS (
        SELECT e.vec_id,
               list_transform(range(1, 65), i ->
                 d.mns[i] + ((CASE WHEN d.scales[i] = 0.0 THEN 0.0
                   ELSE LEAST(255.0, GREATEST(0.0,
                     FLOOR((CAST(e.embedding[i] AS DOUBLE) - d.mns[i])
                           / d.scales[i]))) END)
                   + 0.5) * d.scales[i]) AS rv
        FROM embeddings e, dimarr d
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv
          FROM embeddings WHERE vec_id < 5),
    sims AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
        ROUND(
          list_sum(list_transform(list_zip(c.rv, q.qv),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(c.rv,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(q.qv,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS sim
        FROM recon c, q WHERE c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, sim,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS BIGINT)
               AS rank
    FROM sims QUALIFY rank <= 5
    """,
)
def sim_topk_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 compressed-domain top-k: corpus quantized to one byte per
    dimension (4x smaller at rest than float32), queries stay full
    precision, candidates ranked by cosine over the reconstructed
    (bucket-midpoint) values. Bounds come from one tiny posexplode agg
    (d rows collected — the IVF-seeding contract); encode + reconstruct
    are map-side expressions, so the corpus never shuffles. The oracle
    replays quantization bit-for-bit: min/max, floor, midpoint recon and
    the rounded cosine are the same double arithmetic in both engines.
    The exact-re-rank path (sq8_topk(rerank=R)) is pinned by pytest
    against brute force."""
    from usgs_lidar_spark.operators.similarity import sq8_bounds, sq8_topk

    emb = _t(spark, sf_dir, "embeddings")
    mins, scales = sq8_bounds(emb, "embedding")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sq8_topk(
        emb, queries_df, mins, scales, id_col="vec_id",
        vec_col="embedding", query_id_col="query_id", k=5,
    )


@query(
    "dedup_substring_spans",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\s+') END AS t
        FROM documents
    ), base AS (
        SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(greatest(len(t) - 7, 0) AS BIGINT) AS n_grams, t
        FROM toks
    ), grams AS (
        SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
               array_to_string(t[u.i:u.i+7], ' ') AS gram
        FROM base, LATERAL (
            SELECT unnest(range(1, CAST(n_grams AS INTEGER) + 1)) AS i
        ) u
        WHERE n_grams > 0
    ), dupg AS (
        SELECT gram FROM (SELECT DISTINCT gram, doc_id FROM grams)
        GROUP BY gram HAVING count(*) >= 2
    ), dup_pos AS (
        SELECT g.doc_id, g.pos FROM grams g SEMI JOIN dupg d ON g.gram = d.gram
    ), spans AS (
        SELECT doc_id, pos, pos + 7 AS end_,
               coalesce(max(pos + 7) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS prev_end
        FROM dup_pos
    ), per_doc AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams,
               CAST(sum(greatest(end_ - greatest(pos - 1, prev_end), 0))
                    AS BIGINT) AS dup_tokens_covered
        FROM spans GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_tokens, b.n_grams,
           coalesce(p.n_dup_grams, 0) AS n_dup_grams,
           coalesce(p.dup_tokens_covered, 0) AS dup_tokens_covered,
           CASE WHEN b.n_tokens = 0 THEN 0.0
                ELSE CAST(coalesce(p.dup_tokens_covered, 0) AS DOUBLE)
                     / CAST(b.n_tokens AS DOUBLE) END AS dup_token_fraction
    FROM base b LEFT JOIN per_doc p ON b.doc_id = p.doc_id
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup (Lee et al. 2022, distributed n-gram form):
    per document, the fraction of tokens covered by the UNION of 8-token
    windows whose gram appears in >= 2 distinct documents. Candidate
    marking is a SEMI join against the shared-gram set (fan-out 1 — a
    boilerplate gram can be arbitrarily hot without exploding any join);
    span coverage is one running-max window per doc."""
    from usgs_lidar_spark.operators.dedup import duplicate_ngram_spans

    return duplicate_ngram_spans(
        _t(spark, sf_dir, "documents"), "text", "doc_id", n=8, min_docs=2
    )


def _LEHMER_LONG(id_expr: str, seed: int = 0) -> str:
    """SQL twin of operators/pipeline.portable_hash_long (full-range
    two-round Lehmer, no bucket fold)."""
    x = f"((((({id_expr}) + {1 + seed}) % 2147483647) + 2147483647) % 2147483647)"
    for _ in range(2):
        x = f"(({x}) * 48271) % 2147483647"
    return f"({x})"


def _FOLD64(id_expr: str) -> str:
    """SQL twin of `operators/stats.poisson_multiplicity`'s 64-bit id
    fold: residues mod two distinct 31-bit primes combined mod the
    Lehmer modulus, so ids differing by a multiple of 2^31-1 draw
    independent values (collisions only past lcm(M, M2) ~ 2^62). Both
    residues are non-negative after the double-% idiom, so the combined
    sum needs no further sign normalization."""
    lo = f"(((({id_expr}) % 2147483647) + 2147483647) % 2147483647)"
    hi = f"(((({id_expr}) % 2147483629) + 2147483629) % 2147483629)"
    return f"(({lo} + 48271 * {hi}) % 2147483647)"


#: SQL mirror of copurchase_edges(max_basket=8)'s deterministic
#: truncation — shared by the pagerank and triangle oracles. The cap
#: BINDS on this synthetic lineitem (baskets up to 13 distinct parts
#: per order at sf0.01), so the oracles must replay it exactly.
_CAPPED_LI_CTE = f"""li0 AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), liranked AS (
        SELECT l_orderkey, l_partkey,
               row_number() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY {_LEHMER_LONG("l_partkey")}, l_partkey
               ) AS rn
        FROM li0
    ), li AS (
        SELECT l_orderkey, l_partkey FROM liranked WHERE rn <= 8
    )"""


@query(
    "graph_pagerank_parts",
    oracle=f"""
    WITH {_CAPPED_LI_CTE}, pairs AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
    ), edges AS (
        SELECT pa AS src, pb AS dst FROM pairs
        UNION ALL
        SELECT pb AS src, pa AS dst FROM pairs
    ), nodes AS (
        SELECT DISTINCT src AS node FROM edges
    ), nn AS (SELECT count(*) AS n FROM nodes),
    deg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY src),
    r0 AS (
        SELECT node, CAST(1000000000000 AS BIGINT) // n AS r
        FROM nodes, nn
    ),
    s1 AS (
        SELECT e.dst AS node, sum(r0.r // deg.d) AS s
        FROM edges e JOIN deg ON e.src = deg.node
                     JOIN r0 ON e.src = r0.node
        GROUP BY e.dst
    ),
    r1 AS (
        SELECT nodes.node,
               CAST(15000000000000 AS BIGINT) // (100 * n)
               + (85 * coalesce(s1.s, 0)) // 100 AS r
        FROM nodes CROSS JOIN nn LEFT JOIN s1 ON nodes.node = s1.node
    ),
    s2 AS (
        SELECT e.dst AS node, sum(r1.r // deg.d) AS s
        FROM edges e JOIN deg ON e.src = deg.node
                     JOIN r1 ON e.src = r1.node
        GROUP BY e.dst
    ),
    r2 AS (
        SELECT nodes.node,
               CAST(15000000000000 AS BIGINT) // (100 * n)
               + (85 * coalesce(s2.s, 0)) // 100 AS r
        FROM nodes CROSS JOIN nn LEFT JOIN s2 ON nodes.node = s2.node
    ),
    s3 AS (
        SELECT e.dst AS node, sum(r2.r // deg.d) AS s
        FROM edges e JOIN deg ON e.src = deg.node
                     JOIN r2 ON e.src = r2.node
        GROUP BY e.dst
    ),
    r3 AS (
        SELECT nodes.node,
               CAST(15000000000000 AS BIGINT) // (100 * n)
               + (85 * coalesce(s3.s, 0)) // 100 AS r
        FROM nodes CROSS JOIN nn LEFT JOIN s3 ON nodes.node = s3.node
    )
    SELECT node, CAST(r AS BIGINT) AS rank_scaled
    FROM r3
    """,
)
def graph_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 fixed iterations, damping 0.85) over the part
    co-purchase graph (pairs sharing >= 2 orders, symmetrized). Ranks
    are scaled BIGINTs and every step is integer arithmetic — exact
    under any partitioning, so an iterative graph algorithm gets a full
    value-hash oracle (the chained-CTE replay) instead of a rows-only
    check. Each iteration is one edge-rank equi-join + sum-by-dst.
    The pair build goes through copurchase_edges with max_basket=8,
    bounding per-basket pair fan-out at C(8,2) (VERDICT r5 item 9); the
    synthetic lineitem has baskets up to 13 parts, so the cap binds and
    the oracle mirrors the truncation rule (_CAPPED_LI_CTE)."""
    from usgs_lidar_spark.operators.graph import copurchase_edges, pagerank_fixed

    pairs = copurchase_edges(
        _t(spark, sf_dir, "lineitem"),
        "l_orderkey",
        "l_partkey",
        min_support=2,
        max_basket=8,
    ).select(F.col("src").alias("pa"), F.col("dst").alias("pb"))
    edges = pairs.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionAll(pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
    # Oracled projection is BIGINT-only: the library's derived DOUBLE
    # `rank` (rank_scaled/1e12) was the only non-integer surface and the
    # one suspect in the r6 driver hash-fail; rank_scaled carries the
    # full information, so the convenience column stays library-side.
    return pagerank_fixed(edges, "src", "dst", iterations=3).select(
        "node", "rank_scaled"
    )


@query(
    "pipe_curriculum_order",
    oracle="""
    WITH st AS (
        SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM documents
    ), keyed AS (
        SELECT doc_id, n_chars,
               least(((n_chars - mn) * 4) // (mx - mn + 1),
                     3) AS stage,
               ((((((doc_id + 1) % 2147483647) + 2147483647) % 2147483647)
                 * 48271 % 2147483647) * 48271 % 2147483647) AS shuffle_key
        FROM documents, st
    )
    SELECT doc_id, n_chars, CAST(stage AS BIGINT) AS stage,
           CAST(shuffle_key AS BIGINT) AS shuffle_key,
           CAST(row_number() OVER (PARTITION BY stage
                                   ORDER BY shuffle_key, doc_id) - 1
                AS BIGINT) AS stage_pos,
           CAST((row_number() OVER (PARTITION BY stage
                                    ORDER BY shuffle_key, doc_id) - 1) * 4
                + stage AS BIGINT) AS global_step
    FROM keyed
    """,
)
def pipe_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic interleaved curriculum: documents binned into 4
    equal-width difficulty stages by n_chars, MINSTD-shuffled within
    stage, and scheduled round-robin across stages via
    global_step = stage_pos * 4 + stage. Reproducible on any engine /
    partitioning (integer binning against broadcast min/max scalars,
    seeded portable hash, per-stage windows)."""
    from usgs_lidar_spark.operators.pipeline import curriculum_order

    return curriculum_order(
        _t(spark, sf_dir, "documents"), "doc_id", "n_chars", n_stages=4
    )


@query(
    "dq_profile_lineitem",
    oracle="""
    WITH pairs AS (
        SELECT 'l_quantity' AS col_name, CAST(l_quantity AS DOUBLE) AS value
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT 'l_tax', CAST(l_tax AS DOUBLE) FROM lineitem
    )
    SELECT col_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE value IS NULL) AS BIGINT) AS n_null,
           CAST(count(DISTINCT value) AS BIGINT) AS n_distinct,
           min(value) AS min_value, max(value) AS max_value
    FROM pairs GROUP BY col_name
    """,
)
def dq_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan numeric profiling of four lineitem measures: the inline
    struct-array explode turns N per-column scans into one table pass
    plus a per-column hash aggregate (min/max/null/distinct are all
    partial-aggregable, so the shuffle carries only partial states)."""
    from usgs_lidar_spark.operators.dq import profile_numeric

    return profile_numeric(
        _t(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


@query(
    "sim_sq8_clip_drift",
    oracle="""
    WITH pos AS (SELECT unnest(range(1, 65)) AS i),
    dims AS (
        SELECT i,
               min(CAST(embedding[i] AS DOUBLE)) AS mn,
               max(CAST(embedding[i] AS DOUBLE)) AS mx
        FROM embeddings, pos WHERE vec_id < 400 GROUP BY i
    ),
    bounds AS (
        SELECT i, mn,
               CASE WHEN mx > mn
                    THEN mn + 255.0 * ((mx - mn) / 255.0)
                    ELSE mn END AS hi
        FROM dims
    ),
    newbatch AS (
        SELECT e.vec_id, b.i, CAST(e.embedding[b.i] AS DOUBLE) AS x,
               b.mn, b.hi
        FROM embeddings e, bounds b WHERE e.vec_id >= 400
    )
    SELECT CAST(i - 1 AS BIGINT) AS dim,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) FILTER (WHERE x < mn) AS BIGINT) AS n_below,
           CAST(count(*) FILTER (WHERE x > hi) AS BIGINT) AS n_above,
           CAST(count(*) FILTER (WHERE x < mn OR x > hi) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS clip_rate
    FROM newbatch GROUP BY i
    """,
)
def sim_sq8_clip_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 index maintenance: append a new vector batch under FROZEN
    quantization bounds (old codes stay valid — no rebuild) and report
    per-dimension clip counts. Rising clip_rate is the re-quantize
    signal; the oracle replays the frozen-bounds arithmetic exactly
    (hi = mn + 255*scale in the same doubles)."""
    from usgs_lidar_spark.operators.similarity import sq8_bounds, sq8_clip_metrics

    emb = _t(spark, sf_dir, "embeddings")
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    mins, scales = sq8_bounds(old, "embedding")
    return sq8_clip_metrics(new, mins, scales, "embedding")


@query(
    "pipe_quality_filter",
    oracle="""
    WITH med AS (
        SELECT lang,
               quantile_cont(CAST(n_chars AS BIGINT), 0.5) AS group_median
        FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang, d.n_chars, m.group_median
    FROM documents d JOIN med m ON d.lang = m.lang
    WHERE CAST(d.n_chars AS DOUBLE) >= m.group_median
    """,
)
def pipe_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality pruning: keep each language's top half by
    n_chars against the EXACT group median (integer-valued percentile —
    engine-reproducible threshold; the group-median frame is one row per
    language and broadcast back onto the scan)."""
    from usgs_lidar_spark.operators.pipeline import filter_above_group_median

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return filter_above_group_median(d, "lang", "n_chars")


@query(
    "w4_rolling_distinct",
    oracle="""
    SELECT user_id, event_id,
           CAST(count(DISTINCT event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_types_5
    FROM events
    """,
)
def w4_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling DISTINCT count over a row frame (distinct event types in
    each user's last 5 events): Spark has no distinct window aggregate,
    so the engine form is size(collect_set() OVER frame) — per-frame
    state is bounded by the frame length (5), not the partition, so
    memory stays O(frame) per row at any scale. Ties on ts are broken
    by event_id so the frame contents are deterministic."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.size(F.collect_set("event_type").over(w)).cast("long").alias("n_types_5"),
    )


@query(
    "mm_dedup_binary",
    oracle="""
    SELECT min(doc_id) AS keeper_id,
           CAST(count(*) AS BIGINT) AS n_copies,
           md5(text) AS content_md5
    FROM documents GROUP BY md5(text)
    """,
)
def mm_dedup_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup by content digest: md5 over the binary payload
    (JVM-side), min-id keeper per digest. Payloads never shuffle — only
    16-byte digests and ids move, the whole point at media scale.
    (DuckDB's md5 is VARCHAR-only; the texts are ASCII, so md5(text)
    equals md5 of the UTF-8 payload — same equivalence
    mm_binary_features documents.)"""
    from usgs_lidar_spark.multimodal import to_media_table
    from usgs_lidar_spark.multimodal.binary_ops import dedup_media_by_content

    d = _t(spark, sf_dir, "documents")
    return dedup_media_by_content(to_media_table(d, "doc_id", "text"))


@query(
    "graph_triangles_parts",
    oracle=f"""
    WITH {_CAPPED_LI_CTE}, e AS (
        SELECT a.l_partkey AS a, b.l_partkey AS b
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
    ), tri AS (
        SELECT e1.a, e1.b, e2.b AS c
        FROM e e1
        JOIN e e2 ON e1.b = e2.a
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ), corners AS (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY node
    """,
)
def graph_triangles_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle membership in the co-purchase graph:
    degree-ordered wedge join + semi-join closure finds each triangle
    exactly once (no dedup stage); counts per corner node. Pair build
    via copurchase_edges with max_basket=8 (binding on this synthetic
    lineitem — baskets up to 13 parts; oracle mirrors the rule)."""
    from usgs_lidar_spark.operators.graph import copurchase_edges, triangle_count

    edges = copurchase_edges(
        _t(spark, sf_dir, "lineitem"),
        "l_orderkey",
        "l_partkey",
        min_support=2,
        max_basket=8,
    )
    return triangle_count(edges)


@query(
    "graph_copurchase_capped",
    oracle=f"""
    WITH li AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), ranked AS (
        SELECT l_orderkey, l_partkey,
               row_number() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY {_LEHMER_LONG("l_partkey")}, l_partkey
               ) AS rn
        FROM li
    ), capped AS (
        SELECT l_orderkey, l_partkey FROM ranked WHERE rn <= 3
    )
    SELECT a.l_partkey AS src, b.l_partkey AS dst,
           CAST(count(*) AS BIGINT) AS support
    FROM capped a JOIN capped b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    """,
)
def graph_copurchase_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The degree-capped co-purchase build with the cap BINDING
    (max_basket=3 < TPC-H's up-to-7 lines per order): baskets over the
    cap contribute only their 3 items ranked first by (Lehmer hash,
    item) — the deterministic truncation rule the oracle replays
    exactly. This pins the rule itself; pagerank/triangles use the same
    builder with a non-binding cap."""
    from usgs_lidar_spark.operators.graph import copurchase_edges

    # min_support=1 and the support column exposed: every surviving pair
    # (and its possibly-undercounted support) is value-checked.
    return copurchase_edges(
        _t(spark, sf_dir, "lineitem"),
        "l_orderkey",
        "l_partkey",
        min_support=1,
        max_basket=3,
        keep_support=True,
    )


@query("sketch_hll_mergeable")
def sketch_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches — the 100 TB rollup story that
    approx_count_distinct alone doesn't give you: per-(year, status)
    Datasketches HLL built once (hll_sketch_agg), then the per-year and
    global tiers derived by UNIONING THE SKETCHES (hll_union_agg), never
    rescanning the fact table. Exact distinct counts ride alongside at
    this scale to expose the sketch error in the result itself.

    No SQL oracle by design (Datasketches binary format; DuckDB's HLL is
    a different sketch) — pinned instead by pytest golden equality
    against exact counts' tolerance (test_hll_mergeable_tiers), the same
    weak-check handling as sketch_approx_stats.
    """
    o = _t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("year"),
        F.col("o_orderstatus").alias("status"),
        "o_custkey",
    )
    leaf = o.groupBy("year", "status").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.countDistinct("o_custkey").alias("exact_nd"),
    )
    per_year = leaf.groupBy("year").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_nd"),
        F.sum("exact_nd").alias("sum_leaf_exact"),
    )
    leaf_out = leaf.select(
        "year",
        "status",
        F.hll_sketch_estimate("sk").alias("approx_nd"),
        F.col("exact_nd").cast("long").alias("exact_nd"),
    )
    year_out = per_year.select(
        "year",
        F.lit("ALL").alias("status"),
        "approx_nd",
        F.lit(None).cast("long").alias("exact_nd"),
    )
    return leaf_out.unionByName(year_out)


@query(
    "cdc_snapshot_asof",
    oracle="""
    WITH log AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               value
        FROM events
        WHERE ts <= TIMESTAMP '2024-01-16 00:00:00'
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM log
    )
    SELECT user_id,
           strftime(date_trunc('microseconds', ts),
                    '%Y-%m-%d %H:%M:%S.%f') AS ts,
           value
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC time travel: the per-user state as of 2024-01-16 — the
    changelog collapse behind a pushed-down timestamp cut (historical
    snapshots cost the same one hash aggregate as current state)."""
    from usgs_lidar_spark.operators.cdc import snapshot_asof

    log = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        "value",
    )
    snap = snapshot_asof(
        log, "2024-01-16 00:00:00", "user_id", "ts", "op", ["value"],
        tie_col="event_id",
    )
    return snap.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "value",
    )


@query(
    "pipe_priority_sample",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, lang, n_chars,
               ((CAST(((((((doc_id + 1) % 2147483647) + 2147483647)
                       % 2147483647)
                   * 48271 % 2147483647) * 48271 % 2147483647) AS DOUBLE)
                 + 0.5) / 2147483647.0)
               / CAST(n_chars AS DOUBLE) AS priority
        FROM documents
        WHERE n_chars IS NOT NULL AND n_chars > 0
    )
    SELECT doc_id, lang, n_chars, priority,
           CAST(row_number() OVER (PARTITION BY lang
                                   ORDER BY priority, doc_id) AS BIGINT)
               AS sample_rank
    FROM keyed QUALIFY sample_rank <= 20
    """,
)
def pipe_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k weighted sampling per language (priority sampling,
    u/w order statistics): 20 docs per lang with inclusion odds
    proportional to n_chars. Deterministic on any engine — the uniform
    is the seeded MINSTD hash and both divisions are correctly-rounded
    IEEE ops the oracle replays identically."""
    from usgs_lidar_spark.operators.pipeline import priority_sample_k_per_group

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return priority_sample_k_per_group(d, "doc_id", "lang", "n_chars", k=20)


@query(
    "sim_topk_sq8_rerank",
    oracle="""
    WITH pos AS (SELECT unnest(range(1, 65)) AS i),
    dims AS (
        SELECT i,
               min(CAST(embedding[i] AS DOUBLE)) AS mn,
               max(CAST(embedding[i] AS DOUBLE)) AS mx
        FROM embeddings, pos GROUP BY i
    ),
    dimarr AS (
        SELECT list(mn ORDER BY i) AS mns,
               list(CASE WHEN mx > mn THEN (mx - mn) / 255.0
                         ELSE 0.0 END ORDER BY i) AS scales
        FROM dims
    ),
    recon AS (
        SELECT e.vec_id,
               list_transform(range(1, 65), i ->
                 d.mns[i] + ((CASE WHEN d.scales[i] = 0.0 THEN 0.0
                   ELSE LEAST(255.0, GREATEST(0.0,
                     FLOOR((CAST(e.embedding[i] AS DOUBLE) - d.mns[i])
                           / d.scales[i]))) END)
                   + 0.5) * d.scales[i]) AS rv
        FROM embeddings e, dimarr d
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv
          FROM embeddings WHERE vec_id < 5),
    approx AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
        ROUND(
          list_sum(list_transform(list_zip(c.rv, q.qv),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(c.rv,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(q.qv,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)
               AS asim
        FROM recon c, q WHERE c.vec_id <> q.query_id
    ),
    shortlist AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY asim DESC, neighbor_id) AS rk
        FROM approx QUALIFY rk <= 25
    ),
    exact AS (
        SELECT s.query_id, s.neighbor_id,
        ROUND(
          list_sum(list_transform(list_zip(c.embedding, q.qv),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(c.embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(q.qv,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)
               AS sim
        FROM shortlist s
        JOIN embeddings c ON c.vec_id = s.neighbor_id
        JOIN q ON q.query_id = s.query_id
    )
    SELECT query_id, neighbor_id, sim,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS BIGINT)
               AS rank
    FROM exact QUALIFY rank <= 5
    """,
)
def sim_topk_sq8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production SQ8 path: compressed-domain candidate generation
    (top-25 by reconstructed cosine) followed by exact re-rank of the
    short list — full vectors touched only for nq*25 rows. The oracle
    replays BOTH stages (quantize -> approx rank -> exact rerank), so
    the recall-recovery path carries a full value-hash check, not just
    the pytest parity floor."""
    from usgs_lidar_spark.operators.similarity import sq8_bounds, sq8_topk

    emb = _t(spark, sf_dir, "embeddings")
    mins, scales = sq8_bounds(emb, "embedding")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sq8_topk(
        emb, queries_df, mins, scales, id_col="vec_id",
        vec_col="embedding", query_id_col="query_id", k=5, rerank=25,
    )


@query(
    "sim_topk_ivf_sq8",
    oracle=f"""
    WITH cent AS (
        SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8
    ), csim AS (
        SELECT e.vec_id, e.embedding, c.cid,
               {_cos4("e.embedding", "c.cvec")} AS csim
        FROM embeddings e CROSS JOIN cent c
    ), assigned AS (
        SELECT vec_id, embedding, cid FROM (
            SELECT vec_id, embedding, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid) AS rn
            FROM csim) WHERE rn = 1
    ), pos AS (SELECT unnest(range(1, 65)) AS i),
    dims AS (
        SELECT i,
               min(CAST(embedding[i] AS DOUBLE)) AS mn,
               max(CAST(embedding[i] AS DOUBLE)) AS mx
        FROM embeddings, pos GROUP BY i
    ),
    dimarr AS (
        SELECT list(mn ORDER BY i) AS mns,
               list(CASE WHEN mx > mn THEN (mx - mn) / 255.0
                         ELSE 0.0 END ORDER BY i) AS scales
        FROM dims
    ),
    recon AS (
        SELECT a.vec_id, a.cid,
               list_transform(range(1, 65), i ->
                 d.mns[i] + ((CASE WHEN d.scales[i] = 0.0 THEN 0.0
                   ELSE LEAST(255.0, GREATEST(0.0,
                     FLOOR((CAST(a.embedding[i] AS DOUBLE) - d.mns[i])
                           / d.scales[i]))) END)
                   + 0.5) * d.scales[i]) AS rv
        FROM assigned a, dimarr d
    ),
    probes AS (
        SELECT vec_id AS query_id, embedding AS qv, cid FROM (
            SELECT vec_id, embedding, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid) AS rn
            FROM csim WHERE vec_id < 5) WHERE rn <= 2
    ), sims AS (
        SELECT p.query_id, r.vec_id AS neighbor_id,
               {_cos4("r.rv", "p.qv")} AS sim
        FROM recon r JOIN probes p
          ON r.cid = p.cid AND r.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, sim,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS BIGINT)
               AS rank
    FROM sims QUALIFY rank <= 5
    """,
)
def sim_topk_ivf_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-SQ8 composition: coarse-cell probing (2 of 8 deterministic
    seed cells) with SQ8-compressed scoring inside the probed cells —
    the byte-code sibling of sim_topk_ivf_pq. Oracle replays cell
    assignment, probe selection, quantization, and the rounded-cosine
    ranking end to end."""
    from usgs_lidar_spark.operators.similarity import ivf_sq8_topk, sq8_bounds

    emb = _t(spark, sf_dir, "embeddings")
    seeds = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8).collect()
    ] or [(0, [0.0])]
    mins, scales = sq8_bounds(emb, "embedding")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_sq8_topk(
        emb, queries_df, seeds, mins, scales, id_col="vec_id",
        vec_col="embedding", query_id_col="query_id", k=5, n_probe=2,
    )


def _hillshade_oracle() -> str:
    import math

    z = math.radians(45.0)  # 90 - altitude(45)
    a = math.radians(315.0)
    cz, sz = math.cos(z), math.sin(z)
    ca, sa = math.cos(a), math.sin(a)
    dzdx = "((v_p0 - v_m0) / 2.0)"
    dzdy = "((v_0p - v_0m) / 2.0)"
    # Sun-vector dot surface-normal for a y-up/north grid (azimuth
    # clockwise from north): (-sin a * dzdx - cos a * dzdy).
    raw = (
        f"(({cz!r}) + ({sz!r}) * (({-sa!r}) * {dzdx} + ({-ca!r}) * {dzdy}))"
        f" / sqrt(1.0 + ({dzdx} * {dzdx} + {dzdy} * {dzdy}))"
    )
    return f"""
    WITH {_grid_cte()}
    SELECT ix, iy,
           greatest(0.0, least(1.0, {raw})) * 255.0 AS hillshade
    FROM realc
    WHERE v_m0 IS NOT NULL AND v_p0 IS NOT NULL
      AND v_0m IS NOT NULL AND v_0p IS NOT NULL
    """


@query("z6_hillshade", oracle=None)
def z6_hillshade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytical hillshade over the voxel grid — the cartographic
    companion of z1_twi_grid, algebraically reduced so only +,*,/ and
    sqrt touch data (sun-angle trig is Python-computed constants shared
    verbatim with the oracle); bit-reproducible in any engine."""
    from usgs_lidar_spark.operators.terrain import hillshade_grid

    return hillshade_grid(_price_qty_grid(spark, sf_dir))


ORACLE["z6_hillshade"] = _hillshade_oracle()


@query(
    "ts2_time_weighted_avg",
    oracle="""
    WITH seq AS (
        SELECT user_id, CAST(ts AS DATE) AS day, ts, value,
               lead(ts) OVER (PARTITION BY user_id, CAST(ts AS DATE)
                              ORDER BY ts, event_id) AS next_ts
        FROM events
    ), spans AS (
        SELECT user_id, day,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               date_diff('microsecond', ts, next_ts) AS dur_us
        FROM seq WHERE next_ts IS NOT NULL
    )
    SELECT user_id, CAST(day AS VARCHAR) AS day,
           CAST(sum(cents * dur_us) AS DOUBLE)
               / (100.0 * CAST(sum(dur_us) AS DOUBLE)) AS twap,
           CAST(count(*) AS BIGINT) AS n_spans
    FROM spans GROUP BY user_id, day HAVING sum(dur_us) > 0
    """,
)
def ts2_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per (user, day) — each reading holds
    until the next one, so its weight is that duration (the last reading
    of a day carries no span and is excluded): the TWAP shape irregular
    telemetry needs, where a plain AVG over-weights bursts. Exact
    arithmetic: integer cents x integer microseconds summed as BIGINTs
    (order-independent), one double division at the end; one lead()
    window + one aggregate."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy(
        "ts", "event_id"
    )
    seq = e.select(
        "user_id",
        F.to_date("ts").alias("day"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.lead("ts").over(w).alias("next_ts"),
    ).filter(F.col("next_ts").isNotNull())
    # events.ts loads as TIMESTAMP_NTZ (the nanos-normalization path);
    # unix_micros needs TIMESTAMP. The session runs UTC, and only the
    # DIFFERENCE is used, so the cast is offset-free either way.
    spans = seq.withColumn(
        "dur_us",
        F.unix_micros(F.col("next_ts").cast("timestamp"))
        - F.unix_micros(F.col("ts").cast("timestamp")),
    )
    return (
        spans.groupBy("user_id", "day")
        .agg(
            F.sum(F.col("cents") * F.col("dur_us")).alias("__num"),
            F.sum("dur_us").alias("__den"),
            F.count(F.lit(1)).alias("n_spans"),
        )
        .filter(F.col("__den") > 0)
        .select(
            "user_id",
            F.col("day").cast("string").alias("day"),
            (
                F.col("__num").cast("double")
                / (F.lit(100.0) * F.col("__den").cast("double"))
            ).alias("twap"),
            F.col("n_spans").cast("long").alias("n_spans"),
        )
    )


@query(
    "events_mad_outliers",
    oracle="""
    WITH base AS (
        SELECT event_id, user_id, event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ), med AS (
        SELECT event_type,
               quantile_cont(cents, 0.5) AS med_cents
        FROM base GROUP BY event_type
    ), dev AS (
        SELECT b.event_id, b.user_id, b.event_type, b.cents, m.med_cents,
               abs(CAST(b.cents AS DOUBLE) - m.med_cents) AS adev
        FROM base b JOIN med m ON b.event_type = m.event_type
    ), mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad_cents
        FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.user_id, d.event_type,
           CAST(d.cents AS DOUBLE) / 100.0 AS value,
           d.med_cents / 100.0 AS type_median,
           m.mad_cents / 100.0 AS type_mad
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    WHERE m.mad_cents > 0 AND d.adev > 6.0 * m.mad_cents
    """,
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: events whose value deviates from their
    type's MEDIAN by more than 6x the median absolute deviation — the
    MAD form survives the heavy tails that inflate stddev and mute
    z-scores. Two exact-percentile aggregates over integer cents (the
    interpolated midpoint of two longs is the identical double in any
    engine), each a one-row-per-type frame broadcast back onto the
    scan; zero-MAD types (constant values) are excluded explicitly."""
    e = _t(spark, sf_dir, "events")
    base = e.select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    med = base.groupBy("event_type").agg(
        F.percentile(F.col("cents"), F.lit(0.5)).alias("med_cents")
    )
    dev = base.join(med, "event_type").withColumn(
        "adev", F.abs(F.col("cents").cast("double") - F.col("med_cents"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile(F.col("adev"), F.lit(0.5)).alias("mad_cents")
    )
    return (
        dev.join(mad, "event_type")
        .filter(
            (F.col("mad_cents") > 0)
            & (F.col("adev") > F.lit(6.0) * F.col("mad_cents"))
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            (F.col("cents").cast("double") / 100.0).alias("value"),
            (F.col("med_cents") / 100.0).alias("type_median"),
            (F.col("mad_cents") / 100.0).alias("type_mad"),
        )
    )


@query(
    "graph_2hop_reach",
    oracle="""
    WITH li AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
    ), seeds AS (
        SELECT DISTINCT src AS node FROM e WHERE src % 100 = 0
    ), hop1 AS (
        SELECT DISTINCT e.dst AS node FROM e SEMI JOIN seeds s ON e.src = s.node
    ), frontier AS (
        SELECT node FROM hop1
        UNION SELECT node FROM seeds
    ), hop2 AS (
        SELECT DISTINCT e.dst AS node FROM e SEMI JOIN frontier f ON e.src = f.node
    ), reach AS (
        SELECT node FROM frontier UNION SELECT node FROM hop2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_reachable,
           CAST((SELECT count(*) FROM seeds) AS BIGINT) AS n_seeds,
           CAST((SELECT count(*) FROM hop1) AS BIGINT) AS n_hop1
    FROM reach
    """,
)
def graph_2hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded BFS: parts reachable within 2 hops of the seed set (part
    ids divisible by 100) over the symmetric co-purchase graph. Each hop
    is one SEMI join frontier expansion + distinct — the per-round cost
    model of any distributed BFS; rounds are fixed so the whole traversal
    is one declarative plan (unbounded reachability is
    connected_components' job)."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("s"))
        .filter(F.col("s") >= 2)
        .select("src", "dst")
    )
    seeds = e.filter(F.col("src") % 100 == 0).select(
        F.col("src").alias("node")
    ).distinct()
    hop1 = (
        e.join(seeds, e["src"] == seeds["node"], "left_semi")
        .select(F.col("dst").alias("node"))
        .distinct()
    )
    frontier = hop1.union(seeds).distinct()
    hop2 = (
        e.join(frontier, e["src"] == frontier["node"], "left_semi")
        .select(F.col("dst").alias("node"))
        .distinct()
    )
    reach = frontier.union(hop2).distinct()
    # tier counts ride broadcast 1-row frames — no driver round-trip
    return (
        reach.agg(F.count(F.lit(1)).alias("n_reachable"))
        .crossJoin(
            F.broadcast(seeds.agg(F.count(F.lit(1)).alias("n_seeds")))
        )
        .crossJoin(
            F.broadcast(hop1.agg(F.count(F.lit(1)).alias("n_hop1")))
        )
    )


@query(
    "text_token_entropy",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        FROM documents WHERE trim(text) <> ''
    ), tf AS (
        SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
    ), per_doc AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_types,
               sum(CAST(ROUND(c * ln(c) * 1000000) AS BIGINT)) AS s_scaled
        FROM tf GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_types,
           ln(n_tokens) - (CAST(s_scaled AS DOUBLE) / 1000000.0)
                          / CAST(n_tokens AS DOUBLE) AS entropy,
           CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE)
               AS type_token_ratio
    FROM per_doc
    """,
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution entropy per document (plus type-token ratio) —
    the information-theoretic quality signal: template/repetitive docs
    score low even when repetition_metrics' exact-duplicate windows miss
    them. Uses H = ln(n) - (1/n) * sum(c * ln(c)): each c*ln(c) term is
    rounded to a scaled BIGINT before summation, so the per-doc sum is
    partition-order-independent and both engines agree bit-for-bit (a
    raw double sum over hash-grouped terms would drift with order).
    Empty docs are excluded (entropy of nothing is undefined, not 0)."""
    from usgs_lidar_spark.functions.textstats import ws_tokens

    d = _t(spark, sf_dir, "documents")
    toks = (
        d.filter(F.trim(F.col("text")) != "")
        .select("doc_id", F.explode(ws_tokens("text")).alias("tok"))
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    per_doc = tf.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(
            F.round(
                F.col("c").cast("double")
                * F.log(F.col("c").cast("double"))
                * 1000000
            ).cast("long")
        ).alias("s_scaled"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_types",
        (
            F.log(F.col("n_tokens").cast("double"))
            - (F.col("s_scaled").cast("double") / 1000000.0)
            / F.col("n_tokens").cast("double")
        ).alias("entropy"),
        (
            F.col("n_types").cast("double") / F.col("n_tokens").cast("double")
        ).alias("type_token_ratio"),
    )


@query(
    "dedup_cluster_collapse_incremental",
    oracle=f"""
    WITH RECURSIVE {{shingle_cte}},
    pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.6),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b AS u, id_a AS v FROM pairs),
    walk(id, reach) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT w.id, e.v FROM walk w JOIN edges e ON e.u = w.reach
    ),
    cc AS (SELECT id AS doc_id, min(reach) AS cluster_id FROM walk GROUP BY id),
    csize AS (SELECT cluster_id, count(*) AS cluster_size
              FROM cc GROUP BY cluster_id)
    SELECT cc.doc_id, cc.cluster_id, csize.cluster_size,
           cc.doc_id = cc.cluster_id AS is_kept
    FROM cc JOIN csize USING (cluster_id)
    """,
)
def dedup_cluster_collapse_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental cluster maintenance end to end: the corpus's first
    400 docs are the already-clustered base (labels computed once); the
    rest arrive as a batch whose MinHash pairs are folded in via
    connected_components_incremental — old components participate as
    contracted super-nodes, so the merge step's cost is O(new edges +
    touched components), never a base re-cluster. The oracle is the
    FULL-graph recursive-CTE closure: incremental must equal
    from-scratch bit-for-bit (labels are component-min ids, canonical
    under merging)."""
    from usgs_lidar_spark.operators.dedup import minhash_lsh_pairs
    from usgs_lidar_spark.operators.graph import (
        connected_components,
        connected_components_incremental,
    )

    d = _t(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") < 400)
    new = d.filter(F.col("doc_id") >= 400)
    old_pairs = minhash_lsh_pairs(
        old, "text", "doc_id", k=8, num_perm=64, bands=32,
        threshold=0.6, max_df=20,
    )
    old_labels = connected_components(
        old.select(F.col("doc_id").alias("id")),
        old_pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ),
    ).select("id", F.col("cluster_id").alias("label"))

    all_pairs = minhash_lsh_pairs(
        d, "text", "doc_id", k=8, num_perm=64, bands=32,
        threshold=0.6, max_df=20,
    )
    new_edges = all_pairs.filter(
        (F.col("id_a") >= 400) | (F.col("id_b") >= 400)
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))

    labels = connected_components_incremental(
        old_labels, new.select(F.col("doc_id").alias("id")), new_edges
    )
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        labels.join(sizes, "label")
        .select(
            F.col("id").alias("doc_id"),
            F.col("label").alias("cluster_id"),
            "cluster_size",
            (F.col("id") == F.col("label")).alias("is_kept"),
        )
    )


ORACLE["dedup_cluster_collapse_incremental"] = ORACLE[
    "dedup_cluster_collapse_incremental"
].replace("{shingle_cte}", _SHINGLE_CTE)


@query(
    "pipe_mixture_schedule",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, source,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY ((((((doc_id + 1) % 2147483647) + 2147483647)
                             % 2147483647)
                         * 48271 % 2147483647) * 48271 % 2147483647),
                            doc_id) - 1 AS BIGINT) AS src_pos
        FROM documents WHERE source IN ('src0', 'src1', 'src2')
    )
    SELECT doc_id, source, src_pos,
           (CAST(src_pos AS DOUBLE) + 0.5)
           / (CASE source WHEN 'src0' THEN 3.0
                          WHEN 'src1' THEN 2.0
                          ELSE 1.0 END) AS priority
    FROM keyed
    """,
)
def pipe_mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mixing schedule over three sources (3:2:1): MINSTD
    in-source shuffle, priority = (pos + 0.5)/weight — weighted fair
    queueing, so every prefix of the priority order consumes sources
    proportionally. Deterministic on any engine/partitioning."""
    from usgs_lidar_spark.operators.pipeline import mixture_schedule

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return mixture_schedule(
        d, "doc_id", "source", {"src0": 3.0, "src1": 2.0, "src2": 1.0}
    )


@query(
    "sim_embed_moments",
    oracle="""
    WITH pos AS (SELECT unnest(range(1, 65)) AS i),
    ex AS (
        SELECT i - 1 AS dim,
               CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000)
                    AS BIGINT) AS xs
        FROM embeddings, pos
    ), agg AS (
        SELECT dim, CAST(count(*) AS BIGINT) AS n,
               sum(xs) AS s1, sum(xs * xs) AS s2
        FROM ex GROUP BY dim
    )
    SELECT CAST(dim AS BIGINT) AS dim, n,
           CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000) AS mean,
           sqrt(greatest(0.0,
               CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000 * 1000000)
               - (CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000))
                 * (CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000))))
               AS std
    FROM agg
    """,
)
def sim_embed_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding mean/std in exact fixed-point moments
    (1e-6 components, BIGINT sums — order-independent, engine-exact):
    the statistics feeding embed_standardize's map-side whitening."""
    from usgs_lidar_spark.operators.similarity import embed_moments

    return embed_moments(_t(spark, sf_dir, "embeddings"), "embedding")


@query(
    "text_langid_confusion",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, lang,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\s+') END AS tokens
        FROM documents
    ), hits AS (
        SELECT doc_id, lang,
            CAST(len(list_filter(tokens, t -> list_contains(['the','and','of','to','in','is','that','it'], t))) AS BIGINT) AS en_hits,
            CAST(len(list_filter(tokens, t -> list_contains(['der','die','und','das','ist','nicht','ein','zu'], t))) AS BIGINT) AS de_hits,
            CAST(len(list_filter(tokens, t -> list_contains(['le','la','et','les','des','est','une','dans'], t))) AS BIGINT) AS fr_hits,
            CAST(len(list_filter(tokens, t -> list_contains(['el','la','de','que','y','los','es','una'], t))) AS BIGINT) AS es_hits
        FROM toks
    ), pred AS (
        SELECT lang AS true_lang,
           CASE WHEN en_hits > 0 AND en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
                WHEN de_hits > 0 AND de_hits > en_hits AND de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
                WHEN fr_hits > 0 AND fr_hits > en_hits AND fr_hits > de_hits AND fr_hits >= es_hits THEN 'fr'
                WHEN es_hits > 0 AND es_hits > en_hits AND es_hits > de_hits AND es_hits > fr_hits THEN 'es'
                ELSE 'und' END AS pred_lang
        FROM hits
    )
    SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
    FROM pred GROUP BY 1, 2
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation as a query: the lang-id heuristic's
    confusion matrix against the corpus's labeled `lang` column — one
    extra aggregate over the already-oracled predictor, the shape every
    model-quality dashboard needs (per-class precision/recall fall out
    of this table). The heuristic's known blind spots (markers shared
    across languages, 'und' on zero hits) become visible counts instead
    of anecdotes."""
    from usgs_lidar_spark.functions import textstats as TS

    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            F.col("lang").alias("true_lang"),
            TS.lang_id("text").alias("pred_lang"),
        )
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "pipe_end_to_end_v3",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\s+') END AS t
        FROM documents
    ), base AS (
        SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(greatest(len(t) - 7, 0) AS BIGINT) AS n_grams, t
        FROM toks
    ), grams AS (
        SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
               array_to_string(t[u.i:u.i+7], ' ') AS gram
        FROM base, LATERAL (
            SELECT unnest(range(1, CAST(n_grams AS INTEGER) + 1)) AS i
        ) u
        WHERE n_grams > 0
    ), dupg AS (
        SELECT gram FROM (SELECT DISTINCT gram, doc_id FROM grams)
        GROUP BY gram HAVING count(*) >= 2
    ), dup_pos AS (
        SELECT g.doc_id, g.pos FROM grams g SEMI JOIN dupg d ON g.gram = d.gram
    ), spans AS (
        SELECT doc_id, pos, pos + 7 AS end_,
               coalesce(max(pos + 7) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS prev_end
        FROM dup_pos
    ), per_doc AS (
        SELECT doc_id,
               CAST(sum(greatest(end_ - greatest(pos - 1, prev_end), 0))
                    AS BIGINT) AS covered
        FROM spans GROUP BY doc_id
    ), survivors AS (
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d
        JOIN base b ON d.doc_id = b.doc_id
        LEFT JOIN per_doc p ON d.doc_id = p.doc_id
        WHERE b.n_tokens > 0
          AND CAST(coalesce(p.covered, 0) AS DOUBLE)
              / CAST(b.n_tokens AS DOUBLE) < 0.5
    ), med AS (
        SELECT lang, quantile_cont(CAST(n_chars AS BIGINT), 0.5) AS m
        FROM survivors GROUP BY lang
    ), kept AS (
        SELECT s.doc_id, s.lang, s.source, s.n_chars
        FROM survivors s JOIN med ON s.lang = med.lang
        WHERE CAST(s.n_chars AS DOUBLE) >= med.m
    ), keyed AS (
        SELECT doc_id, lang, source,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY ((((((doc_id + 1) % 2147483647) + 2147483647)
                             % 2147483647)
                         * 48271 % 2147483647) * 48271 % 2147483647),
                            doc_id) - 1 AS BIGINT) AS src_pos
        FROM kept WHERE source IN ('src0', 'src1', 'src2')
    )
    SELECT doc_id, lang, source, src_pos,
           (CAST(src_pos AS DOUBLE) + 0.5)
           / (CASE source WHEN 'src0' THEN 3.0
                          WHEN 'src1' THEN 2.0
                          ELSE 1.0 END) AS priority
    FROM keyed
    """,
)
def pipe_end_to_end_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-5-continuation pipeline composed end to end under ONE
    oracle: substring-span dedup gate (drop docs with >= 50% of tokens
    under cross-doc duplicated 8-gram windows) -> per-language median
    quality pruning over the survivors -> weighted mixture schedule
    (3:2:1 over three sources). Each stage is individually oracled
    (dedup_substring_spans / pipe_quality_filter /
    pipe_mixture_schedule); this pins that they COMPOSE — thresholds
    computed on post-dedup survivors, the schedule over post-filter
    rows — which is where pipeline bugs actually live."""
    from usgs_lidar_spark.operators.dedup import duplicate_ngram_spans
    from usgs_lidar_spark.operators.pipeline import (
        filter_above_group_median,
        mixture_schedule,
    )

    d = _t(spark, sf_dir, "documents")
    spans = duplicate_ngram_spans(d, "text", "doc_id", n=8, min_docs=2)
    survivors = (
        d.join(
            spans.select("doc_id", "n_tokens", "dup_token_fraction"),
            "doc_id",
        )
        .filter(
            (F.col("n_tokens") > 0) & (F.col("dup_token_fraction") < 0.5)
        )
        .select("doc_id", "lang", "source", "n_chars")
    )
    kept = filter_above_group_median(survivors, "lang", "n_chars").drop(
        "group_median"
    )
    sched = mixture_schedule(
        kept, "doc_id", "source", {"src0": 3.0, "src1": 2.0, "src2": 1.0}
    )
    lang_lookup = kept.select("doc_id", "lang")
    return sched.join(lang_lookup, "doc_id").select(
        "doc_id", "lang", "source", "src_pos", "priority"
    )


@query(
    "text_bigram_pmi",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\s+') END AS t
        FROM documents
    ), uni AS (
        SELECT unnest(t) AS tok FROM toks
    ), ucnt AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY tok
    ), tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM ucnt),
    bi AS (
        SELECT t[u.i] AS w1, t[u.i + 1] AS w2
        FROM toks, LATERAL (
            SELECT unnest(range(1, greatest(len(t) - 1, 0) + 1)) AS i
        ) u
        WHERE len(t) >= 2
    ), bcnt AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS cab
        FROM bi GROUP BY w1, w2 HAVING count(*) >= 5
    )
    SELECT b.w1, b.w2, b.cab, a.c AS c1, c.c AS c2, t.n
    FROM bcnt b
    JOIN ucnt a ON b.w1 = a.tok
    JOIN ucnt c ON b.w2 = c.tok
    CROSS JOIN tot t
    """,
)
def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: pointwise mutual information for adjacent
    token bigrams seen >= 5 times — PMI = ln(c_ab * N / (c_a * c_b)),
    the statistic that separates genuine phrases from chance adjacency.
    Bigrams come from one zip of the token array with its tail (no
    self-join over positions); the unigram table joins back twice
    (AQE broadcasts it at dimension size) and the corpus total rides a
    broadcast one-row frame. The ORACLED surface is the exact integer
    sufficient statistics (cab, c1, c2, N) — PMI itself is ln over their
    ratio, a float whose cross-engine hash can turn on a libm ulp (the
    failure class sim_ivf_drift hit in r5), and it is exactly derivable
    from the returned counts: pmi = ln(cab*n / (c1*c2))."""
    from usgs_lidar_spark.functions.textstats import ws_tokens

    d = _t(spark, sf_dir, "documents")
    toks = d.select(ws_tokens("text").alias("t")).filter(F.size("t") >= 2)
    bi = toks.select(
        F.explode(
            F.zip_with(
                F.slice("t", 1, F.size("t") - 1),
                F.slice("t", 2, F.size("t") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bcnt = (
        bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cab"))
        .filter(F.col("cab") >= 5)
    )
    uni = (
        d.select(F.explode(ws_tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = uni.agg(F.sum("c").cast("long").alias("n"))
    a = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    b = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    return (
        bcnt.join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "cab", "c1", "c2", "n")
    )


# =====================================================================
# Keyword retrieval (operators/retrieval.py) — round 6
# =====================================================================

#: Fixed probe query for the retrieval oracles: one rare term (df~25 at
#: sf0.01), two common ones, and one absent from the corpus entirely.
_SEARCH_TERMS = ["dup", "join", "vector", "quantum"]


@query(
    "search_tfidf_topk",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        FROM documents
    ), postings AS (
        SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
        FROM toks
        WHERE term IN ({", ".join(f"'{t}'" for t in sorted(_SEARCH_TERMS))})
        GROUP BY 1, 2
    ), dfs AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM postings GROUP BY 1
    ), scored AS (
        SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms,
               CAST(sum(p.tf * (1000000000 // d.df)) AS BIGINT) AS score
        FROM postings p JOIN dfs d USING (term) GROUP BY 1
    )
    SELECT doc_id, n_hit_terms, score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
               AS rank
    FROM scored QUALIFY rank <= 10
    """,
)
def search_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-terms document retrieval under INTEGER-exact TF-IDF
    (operators/retrieval.tfidf_topk): score = sum tf * (1e9 div df) —
    monotone in df exactly like ln(N/df) but bit-reproducible in any
    64-bit-integer engine (no libm). One corpus pass: postings filtered
    to the query's terms under the scan, df joined back broadcast,
    TakeOrdered top-10 with the (score DESC, id ASC) tie contract. A
    term absent from the corpus ('quantum') contributes nothing rather
    than erroring."""
    from usgs_lidar_spark.operators.retrieval import tfidf_topk

    return tfidf_topk(
        _t(spark, sf_dir, "documents"), _SEARCH_TERMS, k=10
    )


@query(
    "search_term_postings",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        FROM documents
    )
    SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
    FROM toks WHERE term IN ('dup', 'merge')
    GROUP BY 1, 2
    """,
)
def search_term_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverted-index posting list (operators/retrieval.
    term_doc_index) restricted to two probe terms — the materializable
    index a repeated-query workload would write bucketed by term; one
    explode + one (term, doc) aggregate, text never shuffles."""
    from usgs_lidar_spark.operators.retrieval import term_doc_index

    idx = term_doc_index(_t(spark, sf_dir, "documents"))
    return idx.filter(F.col("term").isin(["dup", "merge"]))


@query(
    "pipe_threshold_sweep",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\s+') END AS tokens
        FROM documents
    ), stats AS (
        SELECT doc_id,
               len(tokens) AS n_tokens,
               CASE WHEN len(tokens) = 0 THEN 0.0
                    ELSE CAST(len(list_filter(tokens, t -> list_contains(
                         ['the','and','of','to','in','is','that','it'], t)))
                         AS DOUBLE) / len(tokens) END AS stop_ratio,
               CASE WHEN len(tokens) = 0 THEN 0.0
                    ELSE CAST(list_sum(list_transform(tokens, t -> length(t)))
                         AS DOUBLE) / len(tokens) END AS avg_token_len
        FROM toks
    ), scored AS (
        SELECT CAST(floor(((stop_ratio * 0.4)
                   + (least(n_tokens, 100) / 100.0 * 0.3)
                   + (least(avg_token_len, 10.0) / 10.0 * 0.3)) * 1000)
                   AS BIGINT) AS score_bucket,
               CAST(n_tokens AS BIGINT) AS w
        FROM stats
    ), per_bucket AS (
        SELECT score_bucket, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(w) AS BIGINT) AS wsum
        FROM scored GROUP BY score_bucket
    )
    SELECT score_bucket, n_docs,
           CAST(sum(n_docs) OVER sfx AS BIGINT) AS n_kept,
           CAST(sum(wsum) OVER sfx AS BIGINT) AS weight_kept
    FROM per_bucket
    WINDOW sfx AS (ORDER BY score_bucket DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def pipe_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter calibration (operators/textquality.threshold_sweep):
    per observed permille score bucket, how many documents and tokens a
    `quality >= threshold` filter keeps — the table a pipeline reads to
    choose its cutoff. The quality expression is text_quality_score's,
    bucketed to integers BEFORE any aggregation, so the sweep itself is
    exact-integer; the suffix-sum window runs over the bounded bucket
    domain (<= 1001 rows), never the corpus."""
    from usgs_lidar_spark.functions import textstats as TS
    from usgs_lidar_spark.operators.textquality import threshold_sweep

    d = _t(spark, sf_dir, "documents")
    toks = TS.ws_tokens("text")
    n_tokens = F.size(toks).cast("long")
    stop_ratio = TS.stopword_ratio("text")
    tok_len_sum = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    avg_token_len = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        tok_len_sum.cast("double") / n_tokens
    )
    quality = (
        (stop_ratio * 0.4)
        + (F.least(n_tokens, F.lit(100)) / 100.0 * 0.3)
        + (F.least(avg_token_len, F.lit(10.0)) / 10.0 * 0.3)
    )
    scored = d.select(quality.alias("q"), n_tokens.alias("w"))
    return threshold_sweep(scored, "q", "w")


@query(
    "events_top_paths",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS e1,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), trig AS (
        SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE e3 IS NOT NULL
        GROUP BY 1, 2, 3
    )
    SELECT e1, e2, e3, n,
           CAST(row_number() OVER (ORDER BY n DESC, e1, e2, e3) AS BIGINT)
               AS rank
    FROM trig QUALIFY rank <= 10
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path mining: the 10 most common consecutive
    event-type TRIGRAMS across all user sessions — the product-analytics
    "what do users actually do" query (the 3-step generalization of the
    first-order transition matrix). One user-keyed sequence window, a
    trigram count whose domain is at most |event_types|^3 cells, and a
    TakeOrdered top-10 with full-column tie-break — no corpus-sized sort
    anywhere."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    trig = (
        seq.filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        trig.orderBy(
            F.col("n").desc(), F.col("e1"), F.col("e2"), F.col("e3")
        )
        .limit(10)
        .select(
            "e1",
            "e2",
            "e3",
            "n",
            F.row_number()
            .over(
                Window.orderBy(
                    F.col("n").desc(), F.col("e1"), F.col("e2"), F.col("e3")
                )
            )
            .cast("long")
            .alias("rank"),
        )
    )


@query(
    "pipe_pii_redaction",
    oracle=r"""
    WITH injected AS (
        SELECT doc_id,
               text || ' contact u' || doc_id || '@mail-' || lang
                    || '.com ip 10.0.' || (doc_id % 256)
                    || '.7 call 555-123-' || lpad(CAST(doc_id % 10000
                       AS VARCHAR), 4, '0') AS t
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '[PII-email]', 'g'),
               '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
               '[PII-ipv4]', 'g'),
             '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b',
             '[PII-phone]', 'g') AS text_redacted,
           CAST(len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t,
               '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
               AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(t,
               '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b'))
               AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             + len(regexp_extract_all(t,
               '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
             + len(regexp_extract_all(t,
               '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b'))
               AS BIGINT) AS n_redactions
    FROM injected
    """,
)
def pipe_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (operators/redact.redact_pii) over a corpus with
    deterministic synthetic PII injected per document (the testdata
    corpus is PII-free word salad, so the query plants one email, one
    IPv4 and one phone per doc from doc_id/lang — both engines build the
    identical string). Redaction and per-kind counts are pure JVM-side
    regex in a dialect subset with identical Java/RE2 semantics — no
    UDF, map-only, zero shuffle. Note DuckDB's regexp_replace needs the
    'g' flag to match Spark's replace-all."""
    from usgs_lidar_spark.operators.redact import redact_pii

    d = _t(spark, sf_dir, "documents")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id"),
            F.lit("@mail-"),
            F.col("lang"),
            F.lit(".com ip 10.0."),
            (F.col("doc_id") % 256),
            F.lit(".7 call 555-123-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    return redact_pii(injected, "t").select(
        "doc_id", "text_redacted", "n_email", "n_ipv4", "n_phone",
        "n_redactions",
    )


@query(
    "pipe_end_to_end_v4",
    oracle=r"""
    WITH injected AS (
        SELECT doc_id,
               text || ' contact u' || doc_id || '@mail-' || lang
                    || '.com ip 10.0.' || (doc_id % 256)
                    || '.7 call 555-123-' || lpad(CAST(doc_id % 10000
                       AS VARCHAR), 4, '0') AS t
        FROM documents
    ), red AS (
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(t,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                     '[PII-email]', 'g'),
                   '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                   '[PII-ipv4]', 'g'),
                 '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b',
                 '[PII-phone]', 'g') AS tr
        FROM injected
    ), toks AS (
        SELECT doc_id,
               CASE WHEN trim(tr) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(tr), '\s+') END AS tokens
        FROM red
    ), stats AS (
        SELECT doc_id,
               len(tokens) AS n_tokens,
               CASE WHEN len(tokens) = 0 THEN 0.0
                    ELSE CAST(len(list_filter(tokens, t -> list_contains(
                         ['the','and','of','to','in','is','that','it'], t)))
                         AS DOUBLE) / len(tokens) END AS stop_ratio,
               CASE WHEN len(tokens) = 0 THEN 0.0
                    ELSE CAST(list_sum(list_transform(tokens, t -> length(t)))
                         AS DOUBLE) / len(tokens) END AS avg_token_len
        FROM toks
    ), scored AS (
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS w,
               CAST(floor(((stop_ratio * 0.4)
                   + (least(n_tokens, 100) / 100.0 * 0.3)
                   + (least(avg_token_len, 10.0) / 10.0 * 0.3)) * 1000)
                   AS BIGINT) AS score_bucket
        FROM stats
    ), per_bucket AS (
        SELECT score_bucket, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(w) AS BIGINT) AS wsum
        FROM scored GROUP BY score_bucket
    ), sweep AS (
        SELECT score_bucket,
               CAST(sum(n_docs) OVER sfx AS BIGINT) AS n_kept
        FROM per_bucket
        WINDOW sfx AS (ORDER BY score_bucket DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), tot AS (SELECT max(n_kept) AS N FROM sweep),
    cut AS (
        SELECT max(CASE WHEN s.n_kept * 10 >= 6 * t.N
                        THEN s.score_bucket END) AS c
        FROM sweep s, tot t
    ), kept AS (
        SELECT doc_id, w FROM scored, cut WHERE score_bucket >= cut.c
    ), streams AS (
        SELECT doc_id, w,
               (((((((doc_id) + 1) % 2147483647) + 2147483647) % 2147483647)
                 * 48271 % 2147483647) * 48271 % 2147483647) % 4
                   AS pack_stream
        FROM kept
    ), packed AS (
        SELECT pack_stream, doc_id, w,
               CAST(sum(w) OVER pw - w AS BIGINT) AS token_start
        FROM streams
        WINDOW pw AS (PARTITION BY pack_stream ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT pack_stream, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(w) AS BIGINT) AS total_tokens,
           CAST(max(floor(token_start / 512.0)) + 1 AS BIGINT) AS n_packs,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM packed GROUP BY pack_stream
    """,
)
def pipe_end_to_end_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ROUND-6 pipeline composed end to end under one oracle:
    PII-redact the (synthetically injected) corpus -> score quality on
    the REDACTED text -> pick the keep-threshold FROM THE DATA via the
    threshold sweep (largest permille bucket still keeping >= 60% of
    docs, exact-integer comparison) -> pack the survivors into 512-token
    sequences on the scale-safe default Lehmer streams. Each stage is
    individually oracled (pipe_pii_redaction / pipe_threshold_sweep /
    pipe_pack_streams); this pins that they COMPOSE — quality computed
    post-redaction, the cutoff computed on the sweep of the actual
    corpus, packing over the post-filter survivors — where pipeline bugs
    actually live."""
    from usgs_lidar_spark.functions import textstats as TS
    from usgs_lidar_spark.operators.pipeline import pack_sequences
    from usgs_lidar_spark.operators.redact import redact_pii
    from usgs_lidar_spark.operators.textquality import threshold_sweep

    d = _t(spark, sf_dir, "documents")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id"),
            F.lit("@mail-"),
            F.col("lang"),
            F.lit(".com ip 10.0."),
            (F.col("doc_id") % 256),
            F.lit(".7 call 555-123-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    red = redact_pii(injected, "t")
    toks = TS.ws_tokens("text_redacted")
    n_tokens = F.size(toks).cast("long")
    stop_ratio = TS.stopword_ratio("text_redacted")
    tok_len_sum = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    avg_token_len = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        tok_len_sum.cast("double") / n_tokens
    )
    quality = (
        (stop_ratio * 0.4)
        + (F.least(n_tokens, F.lit(100)) / 100.0 * 0.3)
        + (F.least(avg_token_len, F.lit(10.0)) / 10.0 * 0.3)
    )
    # The sweep gets the RAW quality double (its own floor(q*1000) then
    # matches scored's bucket exactly); re-deriving q from the integer
    # bucket (bucket/1000.0*1000) can mis-floor by one ulp for some
    # bucket values.
    scored = red.select(
        "doc_id",
        n_tokens.alias("w"),
        quality.alias("q"),
        F.floor(quality * 1000).cast("long").alias("score_bucket"),
    )
    sweep = threshold_sweep(scored.select("doc_id", "q", "w"), "q", "w")
    total = sweep.agg(F.max("n_kept").alias("N"))
    cut = (
        sweep.crossJoin(F.broadcast(total))
        .agg(
            F.max(
                F.when(
                    F.col("n_kept") * 10 >= 6 * F.col("N"),
                    F.col("score_bucket"),
                )
            ).alias("c")
        )
    )
    kept = scored.crossJoin(F.broadcast(cut)).filter(
        F.col("score_bucket") >= F.col("c")
    )
    packed = pack_sequences(
        kept.select("doc_id", "w"), "doc_id", "w", budget=512, n_streams=4
    )
    return packed.groupBy("pack_stream").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w").alias("total_tokens"),
        (F.max(F.floor(F.col("token_start") / 512.0)) + 1)
        .cast("long")
        .alias("n_packs"),
        F.sum("doc_id").alias("id_sum"),
    )


@query(
    "search_bm25_topk",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE list_transform(
                        string_split_regex(trim(text), '\s+'),
                        t -> lower(t)) END AS tokens
        FROM documents
    ), stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(tokens)) AS BIGINT) AS total_tokens
        FROM toks
    ), consts AS (
        SELECT CAST((n_docs * 1000000) // total_tokens AS BIGINT)
                   AS inv_avgdl_q6
        FROM stats
    ), post0 AS (
        SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl,
               unnest(list_filter(tokens,
                   t -> t IN ('merge', 'spark', 'stream', 'vector')))
                   AS term
        FROM toks
    ), postings AS (
        SELECT term, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
        FROM post0 GROUP BY term, doc_id, dl
    ), with_df AS (
        SELECT *, CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df
        FROM postings
    ), scored AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_hit_terms,
               CAST(sum((1000000000 // df) *
                    ((22 * tf * 1000000 * 1000000) //
                     (10 * tf * 1000000 + 3 * 1000000
                      + 9 * dl * inv_avgdl_q6))) AS BIGINT) AS score
        FROM with_df, consts
        GROUP BY doc_id
    )
    SELECT doc_id, n_hit_terms, score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
                AS BIGINT) AS rank
    FROM scored
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact BM25-style retrieval (operators/retrieval.bm25_topk):
    TF-saturation + length normalization as exact int64 rationals
    (k1=6/5, b=3/4, 1/avgdl at fixed q6 resolution), reciprocal integer
    idf — zero libm, so the DuckDB oracle reproduces every score bit.
    Query = {merge, spark, stream, vector}, top-10 (score DESC, id)."""
    from usgs_lidar_spark.operators.retrieval import bm25_topk

    return bm25_topk(
        _t(spark, sf_dir, "documents"),
        ["merge", "spark", "stream", "vector"],
        k=10,
    )


@query("search_bm25_from_index", oracle=ORACLE["search_bm25_topk"])
def search_bm25_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION serving path under the same hard oracle as
    `search_bm25_topk`: materialize the term-bucket-partitioned inverted
    index (`write_term_index`), then serve the identical query from it
    (`bm25_topk_from_index`) — the index is an access path, not a
    semantic change, so the expected output is bit-identical to the
    on-the-fly ranker's. At scale this is the form a user actually runs:
    the corpus is tokenized once at build time; each query reads only
    its terms' hash buckets (partition pruning + pushed term filter)
    and corpus stats come from the sidecar. The index builds ONCE into
    a deterministic per-(sf_dir, source snapshot) cache path and later
    invocations reuse it — repeated bench runs measure the serving
    path, and no per-call tempdirs accumulate."""
    from usgs_lidar_spark.operators.retrieval import (
        bm25_topk_from_index,
        write_term_index,
    )

    path, complete = _cached_index_path(
        sf_dir, "term_idx", "documents", "_corpus_stats"
    )
    if not complete:
        write_term_index(_t(spark, sf_dir, "documents"), path)
    return bm25_topk_from_index(
        spark, path, ["merge", "spark", "stream", "vector"], k=10
    )


@query("sim_topk_from_ivf_index", oracle=ORACLE["sim_topk_ivf"])
def sim_topk_from_ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-ANN serving path under the same hard oracle as
    `sim_topk_ivf`: materialize the cell-partitioned IVF index
    (`write_ivf_index`), then run the identical probe query from it
    (`ivf_topk_from_index`) — same quantizer, same (sim DESC, id) rank
    contract, so the expected output matches the in-memory form
    row-for-row. The stored layout turns each probe into a
    partition-pruned scan of n_probe cell directories. The index builds
    ONCE into a deterministic per-(sf_dir, source snapshot) cache path
    and later invocations reuse it — repeated bench runs measure the
    serving path, and no per-call tempdirs accumulate."""
    from usgs_lidar_spark.operators.similarity import (
        ivf_topk_from_index,
        write_ivf_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    path, complete = _cached_index_path(
        sf_dir, "ivf_idx", "embeddings", "_centroids"
    )
    if not complete:
        cents = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in emb.filter(F.col("vec_id") < 8)
            .select("vec_id", "embedding")
            .collect()
        ] or [(0, [0.0])]  # empty-corpus placeholder (see sim_topk_ivf)
        write_ivf_index(emb, cents, path)
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk_from_index(spark, path, queries_df, k=5, n_probe=2)


@query(
    "sim_ivf_trained_serving",
    oracle=f"""
    WITH qe AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))
                   AS qv
        FROM embeddings
    ), cent1 AS (
        SELECT vec_id AS cid, qv AS qc,
               CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS nq
        FROM qe WHERE vec_id < 8
    ), dots1 AS (
        SELECT e.vec_id, e.qv, c.cid, c.nq,
               CAST(list_sum(list_transform(list_zip(e.qv, c.qc),
                                            p -> p[1] * p[2])) AS BIGINT)
                   AS qdot
        FROM qe e CROSS JOIN cent1 c
    ), a1 AS (
        SELECT vec_id, qv, cid FROM (
            SELECT vec_id, qv, cid,
                   row_number() OVER (PARTITION BY vec_id
                       ORDER BY CASE WHEN nq = 0 THEN 0.0
                                ELSE CAST(qdot AS DOUBLE)
                                     / sqrt(CAST(nq AS DOUBLE)) END DESC,
                                cid) AS rn
            FROM dots1) WHERE rn = 1
    ), step1 AS (
        SELECT cid, i AS dim,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(qv[i]) AS BIGINT) AS cs
        FROM a1, unnest(range(1, len(qv) + 1)) AS t(i)
        GROUP BY cid, i
    ), cent2d AS (
        -- round-1 UPDATE as doubles: double(cs)/n then /2^20 — the same
        -- two correctly-rounded IEEE ops the engine's
        -- _kmeans_update_exact performs, so the doubles are identical.
        SELECT cid,
               list(CAST(cs AS DOUBLE) / n / 1048576.0 ORDER BY dim) AS cvec
        FROM step1 GROUP BY cid
    ), cent2n AS (
        -- round-2 candidate set = ALL seed cids: a cell empty in
        -- round 1 keeps its SEED centroid as the round-2 candidate
        -- (kmeans_train_centroids keeps empty cells' previous
        -- centroids in the candidate list every iteration) — building
        -- this from cent2d alone would drop such cells and assign
        -- round 2 against a smaller candidate set than the engine's.
        SELECT s.cid,
               list_transform(
                   coalesce(c2.cvec,
                            list_transform(s.svec,
                                           x -> CAST(x AS DOUBLE))),
                   x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS qc
        FROM (SELECT vec_id AS cid, embedding AS svec
              FROM embeddings WHERE vec_id < 8) s
        LEFT JOIN cent2d c2 ON s.cid = c2.cid
    ), cent2q AS (
        SELECT cid, qc,
               CAST(list_sum(list_transform(qc, v -> v * v)) AS BIGINT) AS nq
        FROM cent2n
    ), dots2 AS (
        SELECT e.vec_id, e.qv, c.cid, c.nq,
               CAST(list_sum(list_transform(list_zip(e.qv, c.qc),
                                            p -> p[1] * p[2])) AS BIGINT)
                   AS qdot
        FROM qe e CROSS JOIN cent2q c
    ), a2 AS (
        SELECT vec_id, qv, cid FROM (
            SELECT vec_id, qv, cid,
                   row_number() OVER (PARTITION BY vec_id
                       ORDER BY CASE WHEN nq = 0 THEN 0.0
                                ELSE CAST(qdot AS DOUBLE)
                                     / sqrt(CAST(nq AS DOUBLE)) END DESC,
                                cid) AS rn
            FROM dots2) WHERE rn = 1
    ), step2 AS (
        SELECT cid, i AS dim,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(qv[i]) AS BIGINT) AS cs
        FROM a2, unnest(range(1, len(qv) + 1)) AS t(i)
        GROUP BY cid, i
    ), cent3d AS (
        SELECT cid,
               list(CAST(cs AS DOUBLE) / n / 1048576.0 ORDER BY dim) AS cvec
        FROM step2 GROUP BY cid
    ), trained AS (
        -- empty-cell keep, replayed: a cell empty in round 2 keeps its
        -- round-1 centroid; empty in round 1 keeps the seed vector.
        SELECT s.cid,
               coalesce(c3.cvec, c2.cvec,
                        list_transform(s.svec, x -> CAST(x AS DOUBLE)))
                   AS cvec
        FROM (SELECT vec_id AS cid, embedding AS svec
              FROM embeddings WHERE vec_id < 8) s
        LEFT JOIN cent2d c2 ON s.cid = c2.cid
        LEFT JOIN cent3d c3 ON s.cid = c3.cid
    ), csim AS (
        SELECT e.vec_id, e.embedding, t.cid,
               {_cos4("e.embedding", "t.cvec")} AS csim
        FROM embeddings e CROSS JOIN trained t
    ), assigned AS (
        SELECT vec_id, embedding, cid FROM (
            SELECT vec_id, embedding, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid) AS rn
            FROM csim) WHERE rn = 1
    ), probes AS (
        SELECT vec_id AS query_id, embedding AS qv, cid FROM (
            SELECT vec_id, embedding, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid) AS rn
            FROM csim WHERE vec_id < 5) WHERE rn <= 2
    ), sims AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               {_cos4("a.embedding", "p.qv")} AS sim
        FROM assigned a JOIN probes p
          ON a.cid = p.cid AND a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, sim,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS BIGINT)
               AS rank
    FROM sims QUALIFY rank <= 5
    """,
)
def sim_ivf_trained_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CLOSED training->serving loop under one hard oracle: TRAIN the
    coarse quantizer with two full exact Lloyd iterations
    (`operators/similarity.kmeans_train_centroids` — the distributed
    work per iteration is one `kmeans_step_exact` scan whose shuffle is
    bounded by k*dim), persist the TRAINED centroids as the
    cell-partitioned IVF index (`write_ivf_index`), and serve the probe
    query from the store (`ivf_topk_from_index`). Unlike
    `sim_topk_ivf`/`sim_topk_from_ivf_index` — which seed cells from the
    first 8 corpus vectors — every cell here is a trained centroid, so
    the oracle replays the whole pipeline: quantized-argmax training
    rounds, the two-IEEE-op centroid updates (bit-identical doubles in
    any engine), empty-cell keeps, rounded-cosine assignment of the
    corpus to the trained cells, 2-cell probing, and the (sim DESC, id)
    top-5 rank."""
    from usgs_lidar_spark.operators.similarity import (
        ivf_topk_from_index,
        kmeans_train_centroids,
        write_ivf_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    path, complete = _cached_index_path(
        sf_dir, "ivf_trained_idx", "embeddings", "_centroids"
    )
    if not complete:
        seeds = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in emb.filter(F.col("vec_id") < 8)
            .select("vec_id", "embedding")
            .collect()
        ] or [(0, [0.0])]  # empty-corpus placeholder (see sim_topk_ivf)
        trained = kmeans_train_centroids(emb, seeds, n_iter=2)
        write_ivf_index(emb, trained, path)
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk_from_index(spark, path, queries_df, k=5, n_probe=2)


@query(
    "search_phrase_match",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE list_transform(
                        string_split_regex(trim(text), '\s+'),
                        t -> lower(t)) END AS tokens
        FROM documents
    ), pos AS (
        SELECT doc_id, unnest(tokens) AS term,
               generate_subscripts(tokens, 1) AS p
        FROM toks
    ), m AS (
        SELECT a.doc_id, a.p
        FROM pos a
        JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
                   AND b.term = 'hash'
        JOIN pos c ON a.doc_id = c.doc_id AND c.p = a.p + 2
                   AND c.term = 'agg'
        WHERE a.term = 'table'
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
           CAST(min(p) - 1 AS BIGINT) AS first_pos
    FROM m GROUP BY doc_id
    """,
)
def search_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact consecutive-phrase search ("table hash agg") via filtered
    positional postings + a per-document lead window
    (operators/retrieval.phrase_match). The oracle deliberately uses a
    DIFFERENT algorithm — a positional self-join — so the window
    formulation's adjacency arithmetic is checked against an independent
    derivation, not an echo of itself."""
    from usgs_lidar_spark.operators.retrieval import phrase_match

    return phrase_match(
        _t(spark, sf_dir, "documents"), ["table", "hash", "agg"]
    )


@query(
    "search_proximity",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE list_transform(
                        string_split_regex(trim(text), '\s+'),
                        t -> lower(t)) END AS tokens
        FROM documents
    ), pos AS (
        SELECT doc_id, unnest(tokens) AS term,
               generate_subscripts(tokens, 1) AS p
        FROM toks
    ), f AS (
        SELECT doc_id, term, p FROM pos
        WHERE term IN ('hash', 'join', 'window')
    ), anchors AS (
        SELECT a.doc_id, a.p, count(DISTINCT b.term) AS nt
        FROM f a JOIN f b
          ON a.doc_id = b.doc_id AND b.p >= a.p AND b.p <= a.p + 5
        GROUP BY a.doc_id, a.p
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
           CAST(min(p) - 1 AS BIGINT) AS first_pos
    FROM anchors WHERE nt = 3 GROUP BY doc_id
    """,
)
def search_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered proximity search ({hash, join, window} within a 6-token
    span, any order) via filtered positional postings + a RANGE-frame
    coverage window (operators/retrieval.proximity_match). The oracle is
    an independent derivation — a positional self-join counting distinct
    covered terms per anchor — so the window formulation's coverage
    arithmetic is cross-checked, not echoed. 1-based generate_subscripts
    maps to the matcher's 0-based token offsets via p-1."""
    from usgs_lidar_spark.operators.retrieval import proximity_match

    return proximity_match(
        _t(spark, sf_dir, "documents"), ["hash", "join", "window"], window=6
    )


@query(
    "events_ewma_dyadic",
    oracle=r"""
    WITH c AS (
        SELECT user_id, event_id, ts,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ), w AS (
        SELECT user_id, event_id,
               list(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 31 PRECEDING AND CURRENT ROW)
                   AS win
        FROM c
    )
    SELECT user_id, event_id,
           CAST(list_sum(list_transform(win,
                (x, i) -> x * (CAST(1 AS BIGINT) << (31 - len(win) + i))))
                AS BIGINT) AS ewma_q32
    FROM w
    """,
)
def events_ewma_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event value,
    EXACT: alpha = 1/2 truncated at 32 trailing events makes every
    weight a dyadic rational, so the numerator scaled by 2^32 is a pure
    int64 —

        ewma_q32(row n) = sum_{i} cents_i * 2^(31 - m + i)

    over the trailing window of m <= 32 events (i 1-based oldest-first;
    newest weight 2^31 = 1/2 of scale). No double ever enters: cents
    (exact 2-decimal money) times power-of-two weights sums far inside
    int64 (cents <= ~10^6, * 2^31 * 32 terms ~ 7*10^16). Cross-engine
    bit-identical where a float EWMA would differ in the last ulp.

    Plan: one shuffle (user partition), a ROWS-frame collect_list whose
    order is the frame order (ts, event_id — total order), then a
    map-side higher-order aggregate. Window is 32 elements max, so the
    per-row array is O(1) regardless of corpus size."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-31, 0)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.collect_list(cents).over(w).alias("win"),
        )
        .select(
            "user_id",
            "event_id",
            F.expr(
                "aggregate(transform(win, (x, i) ->"
                " x * shiftleft(CAST(1 AS BIGINT), 32 - size(win) + i)),"
                " CAST(0 AS BIGINT), (a, b) -> a + b)"
            ).alias("ewma_q32"),
        )
    )


@query(
    "search_hybrid_rrf",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE list_transform(
                        string_split_regex(trim(text), '\\s+'),
                        t -> lower(t)) END AS tokens
        FROM documents
    ), stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(tokens)) AS BIGINT) AS total_tokens
        FROM toks
    ), consts AS (
        SELECT CAST((n_docs * 1000000) // total_tokens AS BIGINT)
                   AS inv_avgdl_q6
        FROM stats
    ), post0 AS (
        SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl,
               unnest(list_filter(tokens,
                   t -> t IN ('merge', 'spark', 'stream', 'vector')))
                   AS term
        FROM toks
    ), postings AS (
        SELECT term, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
        FROM post0 GROUP BY term, doc_id, dl
    ), with_df AS (
        SELECT *, CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df
        FROM postings
    ), scored_kw AS (
        SELECT doc_id,
               CAST(sum((1000000000 // df) *
                    ((22 * tf * 1000000 * 1000000) //
                     (10 * tf * 1000000 + 3 * 1000000
                      + 9 * dl * inv_avgdl_q6))) AS BIGINT) AS kscore
        FROM with_df, consts
        GROUP BY doc_id
    ), kw AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY kscore DESC, doc_id) AS r
        FROM scored_kw ORDER BY kscore DESC, doc_id LIMIT 20
    ), q AS (
        SELECT vec_id AS query_id, embedding AS qv
        FROM embeddings WHERE vec_id = 0
    ), c AS (SELECT vec_id, embedding FROM embeddings),
    sims AS (
        SELECT c.vec_id AS doc_id,
        {_COSINE_SQL}
        FROM c, q WHERE c.vec_id <> q.query_id
    ), vec AS (
        SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS r
        FROM sims ORDER BY sim DESC, doc_id LIMIT 20
    ), fused AS (
        SELECT coalesce(kw.doc_id, vec.doc_id) AS doc_id,
               coalesce(1000000 // (60 + kw.r), 0)
                   + coalesce(1000000 // (60 + vec.r), 0) AS score
        FROM kw FULL OUTER JOIN vec ON kw.doc_id = vec.doc_id
    )
    SELECT doc_id, CAST(score AS BIGINT) AS score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
               AS rank
    FROM fused ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid keyword + vector retrieval with integer-exact
    reciprocal-rank fusion (operators/retrieval.rrf_fuse): the BM25
    top-20 for {merge, spark, stream, vector} fused with the exact
    cosine top-20 neighbors of document 0's embedding, each
    contribution = 10^6 div (60 + rank), absent-from-a-ranker = 0.
    Both rankers keep their own candidates-only scale shapes; the
    fusion itself joins two 20-row short lists. Oracle recomposes the
    whole thing — BM25 CTEs + cosine CTEs + fusion — independently."""
    from usgs_lidar_spark.operators.retrieval import bm25_topk, rrf_fuse
    from usgs_lidar_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    kw = bm25_topk(
        docs, ["merge", "spark", "stream", "vector"], k=20
    ).select("doc_id", "rank")
    queries_df = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    vec = cosine_topk_bruteforce(
        emb, queries_df, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", k=20,
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse([kw, vec], id_col="doc_id", k=10)


@query(
    "a10_equidepth_histogram",
    oracle="""
    WITH v AS (
        SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
               l_orderkey, l_linenumber
        FROM lineitem
    ), ranked AS (
        SELECT cents,
               CAST(row_number() OVER (ORDER BY cents, l_orderkey,
                                       l_linenumber) AS BIGINT) AS r,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM v
    )
    SELECT CAST(((r - 1) * 16) // n AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(cents) AS BIGINT) AS lo,
           CAST(max(cents) AS BIGINT) AS hi
    FROM ranked GROUP BY 1
    """,
)
def a10_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 16-bucket equi-depth histogram of l_extendedprice (cents) —
    the ANALYZE-style optimizer statistic — computed DISTRIBUTED-exact
    via operators/ranking.global_rank: range repartition, bounded
    per-partition count collect, per-slice row_number + broadcast
    offsets. No single-task global window anywhere; the oracle uses the
    naive global row_number (fine in DuckDB) so the two derivations are
    independent. Tie-break (l_orderkey, l_linenumber) makes the order
    total, so bucket contents are layout-independent."""
    from usgs_lidar_spark.operators.ranking import histogram_equidepth

    li = _t(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    return histogram_equidepth(
        li, "cents", ["l_orderkey", "l_linenumber"], buckets=16
    ).select(
        "bucket",
        "n_rows",
        F.col("lo").cast("long").alias("lo"),
        F.col("hi").cast("long").alias("hi"),
    )


@query(
    "pipe_top_quartile_cut",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, lang,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\s+') END AS tokens
        FROM documents
    ), stats AS (
        SELECT doc_id, lang,
               len(tokens) AS n_tokens,
               CASE WHEN len(tokens) = 0 THEN 0.0
                    ELSE CAST(len(list_filter(tokens, t -> list_contains(
                         ['the','and','of','to','in','is','that','it'], t)))
                         AS DOUBLE) / len(tokens) END AS stop_ratio,
               CASE WHEN len(tokens) = 0 THEN 0.0
                    ELSE CAST(list_sum(list_transform(tokens, t -> length(t)))
                         AS DOUBLE) / len(tokens) END AS avg_token_len
        FROM toks
    ), scored AS (
        SELECT doc_id, lang,
               CAST(floor(((stop_ratio * 0.4)
                   + (least(n_tokens, 100) / 100.0 * 0.3)
                   + (least(avg_token_len, 10.0) / 10.0 * 0.3)) * 1000)
                   AS BIGINT) AS sb
        FROM stats
    ), ranked AS (
        SELECT doc_id, lang, sb,
               CAST(row_number() OVER (ORDER BY sb, doc_id) AS BIGINT) AS r,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM scored
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(min(sb) AS BIGINT) AS min_bucket,
           CAST(max(sb) AS BIGINT) AS max_bucket,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM ranked WHERE r * 4 > 3 * n
    GROUP BY lang
    """,
)
def pipe_top_quartile_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-quartile curation cut: keep the documents whose quality
    score ranks in the top 25% of the CORPUS — by exact global rank
    (operators/ranking.global_rank), not a bucketed threshold. Where
    pipe_threshold_sweep answers "what does a cutoff keep",
    this answers "cut at an exact fraction" with a rank*4 > 3*n integer
    comparison and the total (score, doc_id) order deciding boundary
    ties deterministically. No single-task window; the oracle uses the
    naive global row_number. Output is the per-lang census of the kept
    quartile plus an id checksum.

    Scale note: global_rank's parallelism is bounded by the leading
    value's cardinality — the permille score here has <= 1001 distinct
    values, so at extreme corpus sizes one bucket's row_number slice is
    ~n/1001 rows; rank on a finer score resolution (floor(q * 10^6))
    when n/1001 stops fitting a task."""
    from usgs_lidar_spark.functions import textstats as TS
    from usgs_lidar_spark.operators.ranking import global_rank

    d = _t(spark, sf_dir, "documents")
    toks = TS.ws_tokens("text")
    n_tokens = F.size(toks).cast("long")
    stop_ratio = TS.stopword_ratio("text")
    tok_len_sum = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    avg_token_len = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        tok_len_sum.cast("double") / n_tokens
    )
    quality = (
        (stop_ratio * 0.4)
        + (F.least(n_tokens, F.lit(100)) / 100.0 * 0.3)
        + (F.least(avg_token_len, F.lit(10.0)) / 10.0 * 0.3)
    )
    scored = d.select(
        "doc_id", "lang", F.floor(quality * 1000).cast("long").alias("sb")
    )
    ranked = global_rank(scored, ["sb", "doc_id"], rank_col="r")
    total = ranked.agg(F.max("r").alias("n"))
    kept = ranked.crossJoin(F.broadcast(total)).filter(
        F.col("r") * 4 > 3 * F.col("n")
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("sb").alias("min_bucket"),
        F.max("sb").alias("max_bucket"),
        F.sum("doc_id").alias("id_sum"),
    )


@query(
    "search_hybrid_rrf3",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE list_transform(
                        string_split_regex(trim(text), '\\s+'),
                        t -> lower(t)) END AS tokens
        FROM documents
    ), post0 AS (
        SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl,
               unnest(list_filter(tokens,
                   t -> t IN ('merge', 'spark', 'stream', 'vector')))
                   AS term
        FROM toks
    ), postings AS (
        SELECT term, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
        FROM post0 GROUP BY term, doc_id, dl
    ), with_df AS (
        SELECT *, CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df
        FROM postings
    ), t_scored AS (
        SELECT doc_id,
               CAST(sum(tf * (1000000000 // df)) AS BIGINT) AS tscore
        FROM with_df GROUP BY doc_id
    ), kw1 AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY tscore DESC, doc_id) AS r
        FROM t_scored ORDER BY tscore DESC, doc_id LIMIT 20
    ), stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(tokens)) AS BIGINT) AS total_tokens
        FROM toks
    ), consts AS (
        SELECT CAST((n_docs * 1000000) // total_tokens AS BIGINT)
                   AS inv_avgdl_q6
        FROM stats
    ), b_scored AS (
        SELECT doc_id,
               CAST(sum((1000000000 // df) *
                    ((22 * tf * 1000000 * 1000000) //
                     (10 * tf * 1000000 + 3 * 1000000
                      + 9 * dl * inv_avgdl_q6))) AS BIGINT) AS bscore
        FROM with_df, consts
        GROUP BY doc_id
    ), kw2 AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY bscore DESC, doc_id) AS r
        FROM b_scored ORDER BY bscore DESC, doc_id LIMIT 20
    ), q AS (
        SELECT vec_id AS query_id, embedding AS qv
        FROM embeddings WHERE vec_id = 0
    ), c AS (SELECT vec_id, embedding FROM embeddings),
    sims AS (
        SELECT c.vec_id AS doc_id,
        {_COSINE_SQL}
        FROM c, q WHERE c.vec_id <> q.query_id
    ), vec AS (
        SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS r
        FROM sims ORDER BY sim DESC, doc_id LIMIT 20
    ), fused AS (
        SELECT coalesce(kw1.doc_id, kw2.doc_id, vec.doc_id) AS doc_id,
               coalesce(1000000 // (60 + kw1.r), 0)
                   + coalesce(1000000 // (60 + kw2.r), 0)
                   + coalesce(1000000 // (60 + vec.r), 0) AS score
        FROM kw1
        FULL JOIN kw2 ON kw1.doc_id = kw2.doc_id
        FULL JOIN vec
          ON coalesce(kw1.doc_id, kw2.doc_id) = vec.doc_id
    )
    SELECT doc_id, CAST(score AS BIGINT) AS score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
               AS rank
    FROM fused ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def search_hybrid_rrf3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-ranker reciprocal-rank fusion — TF-IDF, BM25, and exact
    cosine, all over the same query ({merge, spark, stream, vector} +
    document 0's embedding) — pinning rrf_fuse's N-way full-outer chain
    (coalesced ids, absent-ranker zero contributions) beyond the 2-way
    case. The keyword rankers share one postings scan; each leg stays
    candidates-only; the fusion joins three 20-row short lists."""
    from usgs_lidar_spark.operators.retrieval import (
        bm25_topk,
        rrf_fuse,
        tfidf_topk,
    )
    from usgs_lidar_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    terms = ["merge", "spark", "stream", "vector"]
    kw1 = tfidf_topk(docs, terms, k=20).select("doc_id", "rank")
    kw2 = bm25_topk(docs, terms, k=20).select("doc_id", "rank")
    queries_df = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    vec = cosine_topk_bruteforce(
        emb, queries_df, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", k=20,
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse([kw1, kw2, vec], id_col="doc_id", k=10)


@query("graph_pagerank_from_edges", oracle=ORACLE["graph_pagerank_parts"])
def graph_pagerank_from_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-graph serving path under the same hard oracle as
    `graph_pagerank_parts`: materialize the co-purchase edge list as a
    src-BUCKETED (src, dst)-sorted table (`write_edge_table`,
    symmetrize=True), then run `pagerank_fixed(...,
    edges_materialized=True)` over the bucketed scan — an access path,
    not a semantic change, so the expected ranks are bit-identical to
    the build-per-query form.

    This is the shape SCALE.md flags for the graph headliners: the
    within-basket self-join edge BUILD (~0.5-1.8 GB shuffle at sf1) is
    iteration-invariant and shared by every graph query over the same
    edges — paying it once at write time leaves serving with a zero
    build cost bucketed scan, a shuffle-free degree aggregate, and
    per-iteration joins that never re-exchange the edge side
    (`test_edge_table_pagerank_parity_and_shuffle`). The table builds
    ONCE into a deterministic per-(sf_dir, source snapshot) external
    path; later invocations in the same session reuse the catalog
    entry, and later processes re-register the existing files as an
    external bucketed table (DDL) without rebuilding."""
    import os

    from usgs_lidar_spark.operators.graph import (
        copurchase_edges,
        pagerank_fixed,
        read_edge_table,
        write_edge_table,
    )

    path, complete = _cached_index_path(
        sf_dir, "pr_edges", "lineitem", ""
    )
    tbl = os.path.basename(path)
    if not spark.catalog.tableExists(tbl):
        if complete:
            # Re-register the existing bucketed files (written by a
            # previous process's saveAsTable) as an external table; the
            # spec must match write_edge_table's layout exactly or the
            # bucket metadata would lie about the file contents.
            spark.sql(
                f"CREATE TABLE {tbl} (src BIGINT, dst BIGINT) "
                "USING PARQUET CLUSTERED BY (src) "
                "SORTED BY (src, dst) INTO 32 BUCKETS "
                f"LOCATION '{path}'"
            )
        else:
            pairs = copurchase_edges(
                _t(spark, sf_dir, "lineitem"),
                "l_orderkey",
                "l_partkey",
                min_support=2,
                max_basket=8,
            )
            write_edge_table(
                pairs, tbl, n_buckets=32, path=path, symmetrize=True
            )
    return pagerank_fixed(
        read_edge_table(spark, tbl),
        iterations=3,
        edges_materialized=True,
    ).select("node", "rank_scaled")


@query("graph_triangles_from_edges", oracle=ORACLE["graph_triangles_parts"])
def graph_triangles_from_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting served from the SAME persisted co-purchase edge
    table as `graph_pagerank_from_edges`, under `graph_triangles_parts`'
    oracle — the second graph headliner whose dominant cost is the
    shared, iteration-invariant edge BUILD (SCALE.md: the within-basket
    self-join). The table stores both orientations (pagerank's layout);
    the unique (src < dst) pairs triangle_count wants fall out of a
    bucketed-scan filter with no extra shuffle. Degree re-orientation
    inside triangle_count shuffles either way, so the serving win here
    is exactly the build cost — measured in tools/scale_round8.py
    (build median 13.8 s vs serve 8.2 s at the sf1 point, interleaved
    n=3). The localCheckpoint matters: triangle_count references its
    edge input ~6x (degree agg, two orientation joins, two wedge sides,
    closing semi-join) and bucketing buys those joins nothing after the
    degree re-orientation reshuffles anyway — without it the table
    re-scans per reference (407 MB read from a 21 MB table, measured)."""
    import os

    from usgs_lidar_spark.operators.graph import (
        copurchase_edges,
        read_edge_table,
        triangle_count,
        write_edge_table,
    )

    path, complete = _cached_index_path(
        sf_dir, "pr_edges", "lineitem", ""
    )
    tbl = os.path.basename(path)
    if not spark.catalog.tableExists(tbl):
        if complete:
            spark.sql(
                f"CREATE TABLE {tbl} (src BIGINT, dst BIGINT) "
                "USING PARQUET CLUSTERED BY (src) "
                "SORTED BY (src, dst) INTO 32 BUCKETS "
                f"LOCATION '{path}'"
            )
        else:
            pairs = copurchase_edges(
                _t(spark, sf_dir, "lineitem"),
                "l_orderkey",
                "l_partkey",
                min_support=2,
                max_basket=8,
            )
            write_edge_table(
                pairs, tbl, n_buckets=32, path=path, symmetrize=True
            )
    uniq = (
        read_edge_table(spark, tbl)
        .filter(F.col("src") < F.col("dst"))
        .localCheckpoint()
    )
    return triangle_count(uniq)


@query(
    "search_hybrid_rrf4",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE list_transform(
                        string_split_regex(trim(text), '\\s+'),
                        t -> lower(t)) END AS tokens
        FROM documents
    ), post0 AS (
        SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl,
               unnest(list_filter(tokens,
                   t -> t IN ('merge', 'spark', 'stream', 'vector')))
                   AS term
        FROM toks
    ), postings AS (
        SELECT term, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
        FROM post0 GROUP BY term, doc_id, dl
    ), with_df AS (
        SELECT *, CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df
        FROM postings
    ), t_scored AS (
        SELECT doc_id,
               CAST(sum(tf * (1000000000 // df)) AS BIGINT) AS tscore
        FROM with_df GROUP BY doc_id
    ), kw1 AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY tscore DESC, doc_id) AS r
        FROM t_scored ORDER BY tscore DESC, doc_id LIMIT 20
    ), stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(tokens)) AS BIGINT) AS total_tokens
        FROM toks
    ), consts AS (
        SELECT CAST((n_docs * 1000000) // total_tokens AS BIGINT)
                   AS inv_avgdl_q6
        FROM stats
    ), b_scored AS (
        SELECT doc_id,
               CAST(sum((1000000000 // df) *
                    ((22 * tf * 1000000 * 1000000) //
                     (10 * tf * 1000000 + 3 * 1000000
                      + 9 * dl * inv_avgdl_q6))) AS BIGINT) AS bscore
        FROM with_df, consts
        GROUP BY doc_id
    ), kw2 AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY bscore DESC, doc_id) AS r
        FROM b_scored ORDER BY bscore DESC, doc_id LIMIT 20
    ), q AS (
        SELECT vec_id AS query_id, embedding AS qv
        FROM embeddings WHERE vec_id = 0
    ), c AS (SELECT vec_id, embedding FROM embeddings),
    sims AS (
        SELECT c.vec_id AS doc_id,
        {_COSINE_SQL}
        FROM c, q WHERE c.vec_id <> q.query_id
    ), vec AS (
        SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS r
        FROM sims ORDER BY sim DESC, doc_id LIMIT 20
    ), pos AS (
        SELECT doc_id, unnest(tokens) AS term,
               generate_subscripts(tokens, 1) AS p
        FROM toks
    ), pm AS (
        SELECT a.doc_id, a.p
        FROM pos a
        JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
                   AND b.term = 'hash'
        JOIN pos c2 ON a.doc_id = c2.doc_id AND c2.p = a.p + 2
                   AND c2.term = 'agg'
        WHERE a.term = 'table'
    ), p_scored AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS pscore
        FROM pm GROUP BY doc_id
    ), ph AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY pscore DESC, doc_id) AS r
        FROM p_scored ORDER BY pscore DESC, doc_id LIMIT 20
    ), fused AS (
        SELECT coalesce(kw1.doc_id, kw2.doc_id, vec.doc_id, ph.doc_id)
                   AS doc_id,
               coalesce(1000000 // (60 + kw1.r), 0)
                   + coalesce(1000000 // (60 + kw2.r), 0)
                   + coalesce(1000000 // (60 + vec.r), 0)
                   + coalesce(1000000 // (60 + ph.r), 0) AS score
        FROM kw1
        FULL JOIN kw2 ON kw1.doc_id = kw2.doc_id
        FULL JOIN vec
          ON coalesce(kw1.doc_id, kw2.doc_id) = vec.doc_id
        FULL JOIN ph
          ON coalesce(kw1.doc_id, kw2.doc_id, vec.doc_id) = ph.doc_id
    )
    SELECT doc_id, CAST(score AS BIGINT) AS score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
               AS rank
    FROM fused ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def search_hybrid_rrf4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-ranker RRF with a PHRASE-BOOST leg (VERDICT r7 stretch):
    TF-IDF + BM25 + exact cosine (the `search_hybrid_rrf3` legs,
    unchanged) + exact-phrase matches for "table hash agg" ranked by
    occurrence count (n_matches DESC, doc_id) — documents containing
    the literal phrase get a reciprocal-rank boost on top of their
    bag-of-words scores, the classic precision lever hybrid stacks add
    last. Every leg keeps its candidates-only shape (the phrase leg is
    `phrase_match`'s filtered positional postings); the fusion joins
    four <= 20-row short lists, integer contributions throughout."""
    from usgs_lidar_spark.operators.retrieval import (
        _rank_topk,
        bm25_topk,
        phrase_match,
        rrf_fuse,
        tfidf_topk,
    )
    from usgs_lidar_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    terms = ["merge", "spark", "stream", "vector"]
    kw1 = tfidf_topk(docs, terms, k=20).select("doc_id", "rank")
    kw2 = bm25_topk(docs, terms, k=20).select("doc_id", "rank")
    queries_df = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    vec = cosine_topk_bruteforce(
        emb, queries_df, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", k=20,
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    ph = _rank_topk(
        phrase_match(docs, ["table", "hash", "agg"]).select(
            "doc_id", F.col("n_matches").alias("score")
        ),
        "doc_id",
        20,
        [],
    ).select("doc_id", "rank")
    return rrf_fuse([kw1, kw2, vec, ph], id_col="doc_id", k=10)


@query("search_bm25_pruned", oracle=ORACLE["search_bm25_topk"])
def search_bm25_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WAND-family max-score pruned BM25 ranker under the SAME hard
    oracle as `search_bm25_topk` — `bm25_topk_pruned` is row-identical
    to the exhaustive ranker by contract (θ from the rarest term's
    exact top-k, per-term upper bounds, left-semi survivor scoring;
    unit-pinned by `test_bm25_pruned_parity`), so the driver's
    value-hash proves the pruning is lossless on the real corpus, not
    just the unit fixtures. Same query, same k as the exhaustive form."""
    from usgs_lidar_spark.operators.retrieval import bm25_topk_pruned

    return bm25_topk_pruned(
        _t(spark, sf_dir, "documents"),
        ["merge", "spark", "stream", "vector"],
        k=10,
    )


@query(
    "text_bpe_pair_counts",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE list_transform(
                        string_split_regex(trim(text), '\s+'),
                        t -> lower(t)) END AS tokens
        FROM documents
    ), words AS (
        SELECT w, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest(tokens) AS w FROM toks)
        GROUP BY w
    ), pairs AS (
        SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, freq
        FROM words, unnest(range(1, CAST(length(w) AS BIGINT))) AS t(i)
        WHERE length(w) >= 2
    ), scored AS (
        SELECT pair, CAST(sum(freq) AS BIGINT) AS n
        FROM pairs GROUP BY pair
    )
    SELECT pair, n,
           CAST(row_number() OVER (ORDER BY n DESC, pair) AS BIGINT)
               AS rank
    FROM scored ORDER BY n DESC, pair LIMIT 30
    """,
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary induction statistic: the top-30 adjacent
    character pairs a BPE trainer would consider for its next merge,
    counted over the word-frequency dictionary (each distinct word's
    pairs weighted by its corpus frequency) — the aggregation trick
    that makes vocab training corpus-size-independent past the first
    token count. `operators/textquality.bpe_pair_counts`; integer
    counts, (n DESC, pair) deterministic rank."""
    from usgs_lidar_spark.operators.textquality import bpe_pair_counts

    return bpe_pair_counts(_t(spark, sf_dir, "documents"), top_k=30)


@query("sim_topk_ivf_pq_from_index", oracle=ORACLE["sim_topk_ivf_pq"])
def sim_topk_ivf_pq_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPRESSED persisted-ANN serving path under the same hard
    oracle as `sim_topk_ivf_pq`: materialize the IVF-PQ index
    (`write_ivf_pq_index` — cells as hive partitions, vectors stored as
    PQ code arrays, codebooks as a sidecar), then serve the identical
    probe query from it (`ivf_pq_topk_from_index`). The probe scan is
    partition-pruned to its cells AND reads codes only — at 100 TB this
    form reads ~n_probe/k of a 16x-smaller-at-rest dataset, with full
    vectors touched exactly once, at build time. Same builds-once
    snapshot cache as the other index-served queries."""
    from usgs_lidar_spark.operators.similarity import (
        ivf_pq_topk_from_index,
        pq_codebooks_from_rows,
        write_ivf_pq_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    path, complete = _cached_index_path(
        sf_dir, "ivf_pq_idx", "embeddings", "_codebooks"
    )
    if not complete:
        seeds = [
            [float(x) for x in r["embedding"]]
            for r in emb.filter(F.col("vec_id") < 8)
            .orderBy("vec_id")
            .collect()
        ] or [[0.0] * 4]  # empty-corpus placeholder (see sim_topk_ivf_pq)
        write_ivf_pq_index(
            emb,
            [(i, v) for i, v in enumerate(seeds)],
            pq_codebooks_from_rows(seeds, n_sub=4),
            path,
        )
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_pq_topk_from_index(
        spark, path, queries_df, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", k=5, n_probe=2,
    )


@query(
    "pipe_negative_samples",
    oracle=f"""
    WITH ring AS (
        SELECT doc_id AS neg_id,
               row_number() OVER (
                   ORDER BY {_LEHMER_LONG("doc_id")}, doc_id
               ) AS pos
        FROM documents
    ), n AS (SELECT count(*) AS n FROM documents),
    probes AS (
        SELECT d.doc_id AS anchor_id,
               ({_LEHMER_LONG("d.doc_id * 1000003 + i.i", seed=1)})
                   % n.n + 1 AS pos
        FROM documents d
        CROSS JOIN n
        CROSS JOIN (SELECT unnest(range(1, 5)) AS i) i
        WHERE d.doc_id < 20 AND n.n > 0
    )
    SELECT DISTINCT p.anchor_id, r.neg_id
    FROM probes p JOIN ring r USING (pos)
    WHERE r.neg_id <> p.anchor_id
    """,
)
def pipe_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-ring negative sampling
    (`operators/pipeline.negative_samples`): 4 pseudo-random corpus
    negatives per anchor (anchors = doc_id < 20) for contrastive-pair
    construction — engine-reproducible (two-round Lehmer ring
    positions, `global_rank` dense ranks with no single-task window,
    one position-keyed equi-join; the probe side is |anchors|*k rows,
    the corpus never cross-joins)."""
    from usgs_lidar_spark.operators.pipeline import negative_samples

    docs = _t(spark, sf_dir, "documents")
    return negative_samples(
        docs, docs.filter(F.col("doc_id") < 20), k=4
    )


@query(
    "sim_knn_classify",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 50),
    c AS (SELECT vec_id, embedding FROM embeddings),
    sims AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
        {_COSINE_SQL}
        FROM c, q WHERE c.vec_id <> q.query_id
    ), nb AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id) AS r
            FROM sims) WHERE r <= 5
    ), votes AS (
        SELECT nb.query_id, e.label AS nl, count(*) AS v
        FROM nb JOIN embeddings e ON nb.neighbor_id = e.vec_id
        GROUP BY 1, 2
    ), pred AS (
        SELECT query_id, nl AS pred_label FROM (
            SELECT query_id, nl,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY v DESC, nl) AS rn
            FROM votes) WHERE rn = 1
    )
    SELECT CAST(t.label AS BIGINT) AS true_label,
           CAST(count(*) AS BIGINT) AS n_eval,
           CAST(sum(CASE WHEN p.pred_label = t.label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct
    FROM pred p JOIN embeddings t ON p.query_id = t.vec_id
    GROUP BY t.label
    """,
)
def sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality probe: 5-NN majority-vote classification of
    the first 50 vectors against the labeled corpus
    (`operators/similarity.knn_classify` — deterministic (votes DESC,
    label ASC) winner over exact cosine neighbors), aggregated to a
    per-true-label accuracy report (true_label, n_eval, n_correct) —
    all integer columns, hash-stable. The neighbor stage is the
    already-oracled brute-force ranking; labels attach to nq*k rows."""
    from usgs_lidar_spark.operators.similarity import knn_classify

    emb = _t(spark, sf_dir, "embeddings")
    eval_q = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pred = knn_classify(emb, eval_q, k=5)
    truth = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
    )
    return (
        pred.join(truth, "query_id")
        .groupBy(F.col("true_label").cast("long").alias("true_label"))
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum(
                F.when(
                    F.col("pred_label") == F.col("true_label"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_correct"),
        )
    )


@query(
    "pipe_temperature_mix",
    oracle=f"""
    WITH sizes AS (
        SELECT lang AS g, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY lang
    ), weights AS (
        SELECT g, n,
               CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1048576.0) AS BIGINT)
                   AS w
        FROM sizes
    ), tot AS (SELECT CAST(sum(w) AS BIGINT) AS wsum FROM weights),
    quotas AS (
        SELECT g, n,
               CAST(CAST(200 AS BIGINT) * w // wsum AS BIGINT) AS q
        FROM weights, tot
    ), ranked AS (
        SELECT lang AS g, doc_id,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY {_LEHMER_LONG("doc_id")}, doc_id
               ) AS rn
        FROM documents
    ), kept AS (
        SELECT r.g, r.doc_id
        FROM ranked r JOIN quotas q ON r.g = q.g
        WHERE r.rn <= q.q
    )
    SELECT q.g AS lang, q.n AS n_docs, q.q AS quota,
           CAST(coalesce(k.cnt, 0) AS BIGINT) AS n_kept,
           CAST(coalesce(k.sid, 0) AS BIGINT) AS kept_id_sum
    FROM quotas q
    LEFT JOIN (
        SELECT g, count(*) AS cnt, sum(doc_id) AS sid
        FROM kept GROUP BY g
    ) k ON q.g = k.g
    """,
)
def pipe_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based (T = 2, alpha = 1/2) source mixing over the
    skewed per-language corpus: quotas proportional to sqrt(group size)
    upweight tail languages vs proportional sampling
    (`operators/pipeline.temperature_mix_sqrt`, budget 200). Weights
    are floor(sqrt(n)*2^20) BIGINTs (correctly-rounded sqrt +
    power-of-two multiply: no rounding decision), quotas integer
    division, selection the per-group Lehmer order — the REPORT pins
    the selected set via kept_id_sum, all bit-reproducible."""
    from usgs_lidar_spark.operators.pipeline import temperature_mix_sqrt

    return temperature_mix_sqrt(
        _t(spark, sf_dir, "documents"), budget=200, group_col="lang"
    )


# =====================================================================
# Round 8 continuation: corpus statistics + quality-model scoring +
# span-level dedup — the embedding-training / LM-filter / passage-dedup
# stages of the training-data pipeline.
# =====================================================================

_TOK_LOWER_SQL = (
    "list_transform(regexp_split_to_array(trim(text), '\\s+'), w -> lower(w))"
)


@query(
    "text_skipgram_pairs",
    oracle=f"""
    WITH t AS (
        SELECT {_TOK_LOWER_SQL} AS tk
        FROM documents WHERE length(trim(text)) > 0
    ), pos AS (
        SELECT tk, unnest(range(1, len(tk))) AS i FROM t WHERE len(tk) >= 2
    ), offs AS (SELECT unnest(range(1, 4)) AS d),
    pairs AS (
        SELECT least(tk[i], tk[i + d]) AS w1,
               greatest(tk[i], tk[i + d]) AS w2
        FROM pos CROSS JOIN offs WHERE i + d <= len(tk)
    ), counted AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
        FROM pairs GROUP BY w1, w2
    )
    SELECT w1, w2, n,
           CAST(row_number() OVER (ORDER BY n DESC, w1, w2) AS BIGINT) AS rank
    FROM counted ORDER BY n DESC, w1, w2 LIMIT 50
    """,
)
def text_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram co-occurrence pair counts (window 3, top 50) — the
    word2vec/GloVe embedding-training corpus statistic
    (`operators/textquality.skipgram_pairs`). Pair generation is a
    map-only nested-sequence expression (no positional self-join); the
    one shuffle carries the map-combined pair vocabulary. Deterministic
    ranking (n DESC, w1, w2)."""
    from usgs_lidar_spark.operators.textquality import skipgram_pairs

    return skipgram_pairs(
        _t(spark, sf_dir, "documents"), window=3, top_k=50
    )


@query(
    "text_hashed_classifier",
    oracle=f"""
    WITH weights AS (
        SELECT CAST(f AS BIGINT) AS feature_id,
               CAST({_LEHMER_LONG("f")} % 2001 - 1000 AS BIGINT) AS weight
        FROM (SELECT unnest(range(0, 256)) AS f)
    ), tokens AS (
        SELECT doc_id, unnest({_TOK_LOWER_SQL}) AS w
        FROM documents WHERE length(trim(text)) > 0
    ), feats AS (
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(w) + 1),
                                      i -> CAST(ascii(w[i]) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 1000000007) % 256
                   AS feature_id
        FROM tokens
    ), scored AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(coalesce(sum(weight), 0) AS BIGINT) AS score
        FROM feats LEFT JOIN weights USING (feature_id)
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(s.score, 0) AS BIGINT) AS score
    FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
    """,
)
def text_hashed_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier SERVING over hashed token features
    (`operators/textquality.hashed_feature_score`): the fastText-style
    scoring pass of a data pipeline — hashing-trick features (256-way
    polynomial hash, no vocabulary build), broadcast integer weight
    table, map-only scoring, one doc-keyed sum. The weight table here
    is a deterministic Lehmer-derived fixture (what matters is the
    serving plumbing; real weights arrive as a dim table the same
    way), so both engines rebuild identical weights."""
    from usgs_lidar_spark.operators.pipeline import portable_hash_long
    from usgs_lidar_spark.operators.textquality import hashed_feature_score

    weights = spark.range(256).select(
        F.col("id").cast("long").alias("feature_id"),
        (portable_hash_long(F.col("id")) % 2001 - 1000)
        .cast("long")
        .alias("weight"),
    )
    return hashed_feature_score(
        _t(spark, sf_dir, "documents"), weights, n_features=256
    )


@query(
    "text_bigram_surprisal",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_TOK_LOWER_SQL} AS tk
        FROM documents WHERE length(trim(text)) > 0
    ), slots AS (
        SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
        FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
              FROM t WHERE len(tk) >= 2)
    ), bc AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS bc
        FROM slots GROUP BY w1, w2
    ), ctx AS (
        SELECT w1, CAST(sum(bc) AS BIGINT) AS ctx FROM bc GROUP BY w1
    ), v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM bc),
    scored AS (
        SELECT s.doc_id,
               (length(to_base(c.ctx + v.v, 2)) - 1)
               - (length(to_base(b.bc + 1, 2)) - 1) AS bits
        FROM slots s
        JOIN bc b USING (w1, w2)
        JOIN ctx c USING (w1)
        CROSS JOIN v
    ), per AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(bits) AS BIGINT) AS surprisal_bits
        FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(coalesce(p.surprisal_bits, 0) AS BIGINT) AS surprisal_bits
    FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
    """,
)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact bigram LM surprisal — the CCNet/Gopher perplexity
    filter without a float log (`operators/textquality.
    bigram_surprisal`): add-one-smoothed self-scored bigram LM, each
    slot contributing floorlog2(ctx+V) - floorlog2(cnt+1) (binary bit
    length, exact in both engines), so the quality signal is
    bit-stable under any partitioning. Zipf-head context lookups take
    the two-tier hot-broadcast join; corpus stats are map-combined
    aggregates."""
    from usgs_lidar_spark.operators.textquality import bigram_surprisal

    return bigram_surprisal(_t(spark, sf_dir, "documents"))


@query(
    "dedup_chunk_reassemble",
    oracle="""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
        FROM documents WHERE length(trim(text)) > 0
    ), ch AS (
        SELECT doc_id, CAST(s // 4 AS BIGINT) AS chunk_id,
               array_to_string(list_slice(tk, s + 1, s + 4), ' ') AS ct
        FROM (SELECT doc_id, tk, unnest(range(0, len(tk), 4)) AS s FROM t)
    ), ranked AS (
        SELECT doc_id, chunk_id, ct,
               row_number() OVER (PARTITION BY ct
                                  ORDER BY doc_id, chunk_id) AS rn
        FROM ch
    ), kept AS (SELECT doc_id, chunk_id, ct FROM ranked WHERE rn = 1),
    tot AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
        FROM ch GROUP BY doc_id
    ), kp AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(ct, ' ' ORDER BY chunk_id) AS new_text
        FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(tot.n_chunks, 0) AS BIGINT) AS n_chunks,
           CAST(coalesce(kp.n_kept, 0) AS BIGINT) AS n_kept,
           coalesce(kp.new_text, '') AS new_text
    FROM documents d
    LEFT JOIN tot ON d.doc_id = tot.doc_id
    LEFT JOIN kp ON d.doc_id = kp.doc_id
    """,
)
def dedup_chunk_reassemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document passage dedup with reassembly (Lee et al. span
    dedup at 4-token chunk granularity, `operators/dedup.
    chunk_dedup_docs`): each distinct chunk survives only at its first
    corpus occurrence (min (doc_id, chunk_id) — map-combinable
    election over sha256 digests, text never shuffles), then documents
    rebuild from their surviving chunks in order. ~6% of chunks at
    sf0.01 are cross-doc duplicates, so the pass visibly rewrites
    texts. Every input doc returns a row (row in = row out)."""
    from usgs_lidar_spark.operators.dedup import chunk_dedup_docs

    return chunk_dedup_docs(
        _t(spark, sf_dir, "documents"), chunk_tokens=4
    )


def _bpe_oracle_sql(n_merges: int) -> str:
    """Programmatically unrolled DuckDB oracle for `bpe_learn_merges`:
    one (pairs, best, seq) CTE round per merge, replaying the same
    greedy space-doubling string rewrite the Spark trainer applies."""
    ctes = [
        "vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM ("
        "SELECT unnest(list_transform(regexp_split_to_array(trim(text), "
        "'\\s+'), x -> lower(x))) AS w FROM documents "
        "WHERE length(trim(text)) > 0) GROUP BY w)",
        "seq1 AS (SELECT w, array_to_string(list_transform("
        "range(1, length(w) + 1), i -> w[i]), ' ') AS seq, freq FROM vocab)",
    ]
    for k in range(1, n_merges + 1):
        ctes.append(
            f"pairs{k} AS (SELECT s[i] AS l, s[i + 1] AS r, "
            f"CAST(sum(freq) AS BIGINT) AS n FROM ("
            f"SELECT s, freq, unnest(range(1, len(s))) AS i FROM ("
            f"SELECT string_split(seq, ' ') AS s, freq FROM seq{k})) "
            f"GROUP BY s[i], s[i + 1])"
        )
        ctes.append(
            f"best{k} AS (SELECT l, r, n FROM pairs{k} "
            f"WHERE n >= 2 ORDER BY n DESC, l, r LIMIT 1)"
        )
        # LEFT JOIN ON TRUE, not CROSS JOIN: when a merge round
        # early-stops (best{k} empty — no pair occurs twice), the
        # trainer keeps the last vocabulary, so seq{k+1} must fall back
        # to seq{k} unchanged. A CROSS JOIN against the empty best{k}
        # would empty seq{k+1} and report zero symbols/segmentations
        # for every later step — a false mismatch vs the Spark trainer
        # on any corpus that exhausts its mergeable pairs.
        ctes.append(
            f"seq{k + 1} AS (SELECT w, CASE WHEN b.l IS NULL THEN seq "
            f"ELSE trim(replace(replace("
            f"' ' || replace(seq, ' ', '  ') || ' ', "
            f"' ' || b.l || '  ' || b.r || ' ', "
            f"' ' || b.l || b.r || ' '), '  ', ' ')) END AS seq, freq "
            f"FROM seq{k} LEFT JOIN best{k} b ON TRUE)"
        )
    unions = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS step, l AS left, r AS right, n "
        f"FROM best{k}"
        for k in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + unions


@query("text_bpe_learn_merges", oracle=_bpe_oracle_sql(4))
def text_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE tokenizer TRAINER loop (4 merge rounds) —
    `operators/textquality.bpe_learn_merges`: iterative argmax pair +
    greedy merge application over the word-frequency dictionary.
    Every round is bounded by |vocab| (the corpus is scanned once);
    only the single learned (left, right, n) row reaches the driver
    per round — it parameterizes the next map. The oracle unrolls the
    same four rounds as CTEs over the same space-doubling string
    rewrite, so pair counts, argmax tie-breaks, AND the greedy
    application order are all value-pinned."""
    from usgs_lidar_spark.operators.textquality import bpe_learn_merges

    return bpe_learn_merges(_t(spark, sf_dir, "documents"), n_merges=4)


def _bpe_curve_oracle_sql(n_merges: int) -> str:
    """Oracle for `bpe_compression_curve`: the same unrolled trainer CTEs
    as `_bpe_oracle_sql`, finishing with one symbol-count aggregate per
    step (step 0 = raw characters)."""
    base = _bpe_oracle_sql(n_merges)
    ctes = base[: base.rindex("\n")]  # strip the merges-union tail
    # Step 0 (raw characters) always exists; step k >= 1 exists ONLY if
    # merge k was actually learned (the trainer early-stops and emits
    # fewer curve rows when no pair occurs twice). The EXISTS guard +
    # GROUP BY makes the row vanish with best{k} — an aggregate without
    # GROUP BY would emit a spurious 1-row-per-step tail instead.
    parts = [
        "SELECT CAST(0 AS BIGINT) AS step, "
        "CAST(coalesce(sum(len(string_split(seq, ' ')) * freq), 0) "
        "AS BIGINT) AS corpus_symbols FROM seq1"
    ]
    parts += [
        f"SELECT step, corpus_symbols FROM ("
        f"SELECT CAST({k} AS BIGINT) AS step, "
        f"CAST(sum(len(string_split(seq, ' ')) * freq) "
        f"AS BIGINT) AS corpus_symbols FROM seq{k + 1} "
        f"WHERE EXISTS (SELECT 1 FROM best{k}) GROUP BY 1)"
        for k in range(1, n_merges + 1)
    ]
    return ctes + "\n" + " UNION ALL ".join(parts)


@query("text_bpe_compression", oracle=_bpe_curve_oracle_sql(4))
def text_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer compression/fertility curve over 4 BPE merge rounds
    (`operators/textquality.bpe_compression_curve`): corpus symbol
    count after each learned merge — the budget statistic a tokenizer
    decision reads. One trainer run plus one |vocab|-sized aggregate
    per step; corpus_symbols is an exact BIGINT, monotone
    non-increasing in step. The oracle replays the trainer CTEs and
    counts symbols per round."""
    from usgs_lidar_spark.operators.textquality import bpe_compression_curve

    return bpe_compression_curve(_t(spark, sf_dir, "documents"), n_merges=4)


@query(
    "text_class_keyness",
    oracle=f"""
    WITH cw AS (
        SELECT lang AS class, w, CAST(count(*) AS BIGINT) AS a
        FROM (SELECT lang, unnest({_TOK_LOWER_SQL}) AS w
              FROM documents WHERE length(trim(text)) > 0)
        GROUP BY lang, w
    ), wt AS (SELECT w, CAST(sum(a) AS BIGINT) AS nw FROM cw GROUP BY w),
    ct AS (SELECT class, CAST(sum(a) AS BIGINT) AS nc FROM cw GROUP BY class),
    g AS (SELECT CAST(sum(a) AS BIGINT) AS n FROM cw),
    scored AS (
        SELECT cw.class, cw.w, cw.a,
               CAST((length(to_base(cw.a + 1, 2)) - 1)
                  + (length(to_base((g.n - ct.nc) - (wt.nw - cw.a) + 1, 2)) - 1)
                  - (length(to_base(wt.nw - cw.a + 1, 2)) - 1)
                  - (length(to_base(ct.nc - cw.a + 1, 2)) - 1)
                  AS BIGINT) AS keyness_bits
        FROM cw JOIN wt USING (w) JOIN ct USING (class) CROSS JOIN g
    )
    SELECT class, w AS token, a AS n_in_class, keyness_bits,
           CAST(row_number() OVER (PARTITION BY class
                                   ORDER BY keyness_bits DESC, w)
                AS BIGINT) AS rank
    FROM scored QUALIFY rank <= 5
    """,
)
def text_class_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language keyword extraction by integer log-odds keyness
    (`operators/textquality.class_keyness`, top 5 per class): the
    Monroe-et-al distinctive-vocabulary statistic quantized to exact
    BITS (four bit lengths, no products — overflow-free at any corpus
    size, bit-identical across engines). One map-combined (class,
    token) pass over the corpus; totals reduce from it; the rank
    window runs on the vocab domain, never the corpus."""
    from usgs_lidar_spark.operators.textquality import class_keyness

    return class_keyness(_t(spark, sf_dir, "documents"), top_k=5)


@query(
    "events_funnel_ordered",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_type,
               date_trunc('microseconds', ts) AS ts
        FROM events
    ), v AS (
        SELECT user_id, min(ts) AS t1 FROM ev
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM ev e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM ev e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS stage, 'view' AS event_type,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(coalesce(sum(user_id), 0) AS BIGINT) AS user_id_sum
        FROM v
        UNION ALL
        SELECT CAST(2 AS BIGINT), 'click', CAST(count(*) AS BIGINT),
               CAST(coalesce(sum(user_id), 0) AS BIGINT) FROM c
        UNION ALL
        SELECT CAST(3 AS BIGINT), 'purchase', CAST(count(*) AS BIGINT),
               CAST(coalesce(sum(user_id), 0) AS BIGINT) FROM p
    )
    """,
)
def events_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase, strictly
    later timestamps at each step): per-stage user counts, the product
    analytics query. Each stage is a per-user min-timestamp aggregate
    over the PREVIOUS stage's survivors — three user-keyed
    map-combined aggregates plus two user-equi joins, no windows over
    the event stream; at any scale the state per user is one
    timestamp. user_id_sum pins the surviving SETS, not just counts.
    Timestamps compare at microsecond precision on both engines
    (events.ts is TIMESTAMP(NANOS) at rest; the loader truncates)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(df: DataFrame, k: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(k).cast("long").alias("stage"),
            F.lit(name).alias("event_type"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.coalesce(F.sum("user_id"), F.lit(0))
            .cast("long")
            .alias("user_id_sum"),
        )

    return (
        stage(v, 1, "view")
        .unionByName(stage(c, 2, "click"))
        .unionByName(stage(p, 3, "purchase"))
    )


@query(
    "pipe_split_leakage",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.6),
    sp AS (
        SELECT doc_id,
               CASE WHEN {_LEHMER_BUCKET("doc_id")} < 8000
                    THEN 'train' ELSE 'test' END AS split
        FROM documents
    )
    SELECT sa.split AS split_a, sb.split AS split_b,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(p.id_a + p.id_b) AS BIGINT) AS id_sum
    FROM pairs p
    JOIN sp sa ON p.id_a = sa.doc_id
    JOIN sp sb ON p.id_b = sb.doc_id
    GROUP BY sa.split, sb.split
    """,
)
def pipe_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split LEAKAGE audit — the eval-integrity check a
    training pipeline runs before trusting held-out numbers: near-dup
    pairs (MinHash-LSH, the already-oracled detector) bucketed by
    which splits the two documents landed in. A (train, test) or
    (test, train) row is leakage: the test doc has a near-duplicate in
    train. Composition of two oracled primitives — the pair scan is
    banded candidates only, the split column is a map-only hash, and
    the report joins |pairs| rows to a two-column split projection."""
    from usgs_lidar_spark.operators.dedup import minhash_lsh_pairs
    from usgs_lidar_spark.operators.pipeline import split_by_hash

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id",
        k=8, num_perm=64, bands=32, threshold=0.6, max_df=20,
    )
    splits = split_by_hash(
        docs, "doc_id", {"train": 0.8, "test": 0.2}
    ).select("doc_id", "split")
    sa = splits.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
        "split", "split_a"
    )
    sb = splits.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
        "split", "split_b"
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("id_a") + F.col("id_b")).cast("long").alias("id_sum"),
        )
    )


def _bpe_tokenize_oracle_sql(n_merges: int) -> str:
    """Oracle for `bpe_apply`: the unrolled trainer CTEs (which carry
    ``w`` through every rewrite), finished by joining each document's
    tokens to the final segmentation table and summing symbols."""
    base = _bpe_oracle_sql(n_merges)
    ctes = base[: base.rindex("\n")]
    return (
        ctes
        + f"""
    , toks AS (
        SELECT doc_id, unnest({_TOK_LOWER_SQL}) AS w
        FROM documents WHERE length(trim(text)) > 0
    ), per AS (
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(len(string_split(f.seq, ' '))) AS BIGINT)
                   AS n_bpe_tokens
        FROM toks t JOIN seq{n_merges + 1} f USING (w)
        GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
           CAST(coalesce(p.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
    FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id"""
    )


@query("text_bpe_tokenize", oracle=_bpe_tokenize_oracle_sql(4))
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer SERVING (`operators/textquality.bpe_apply`): learn 4
    BPE merges, then segment every document by JOINING its tokens to
    the vocab-sized final segmentation table (no merge rewrite ever
    touches document rows) — per-doc BPE token counts, the number the
    packing / context-budget stages consume. Every doc keeps a row."""
    from usgs_lidar_spark.operators.textquality import bpe_apply

    return bpe_apply(_t(spark, sf_dir, "documents"), n_merges=4)


@query(
    "dedup_chunk_incremental",
    oracle="""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
        FROM documents WHERE length(trim(text)) > 0
    ), ch AS (
        SELECT doc_id, CAST(s // 4 AS BIGINT) AS chunk_id,
               array_to_string(list_slice(tk, s + 1, s + 4), ' ') AS ct
        FROM (SELECT doc_id, tk, unnest(range(0, len(tk), 4)) AS s FROM t)
    ), seen AS (SELECT DISTINCT ct FROM ch WHERE doc_id < 400),
    bat AS (SELECT * FROM ch WHERE doc_id >= 400),
    fresh AS (
        SELECT b.doc_id, b.chunk_id, b.ct
        FROM bat b LEFT JOIN seen s ON b.ct = s.ct
        WHERE s.ct IS NULL
    ), kept AS (
        SELECT doc_id, chunk_id, ct FROM (
            SELECT doc_id, chunk_id, ct,
                   row_number() OVER (PARTITION BY ct
                                      ORDER BY doc_id, chunk_id) AS rn
            FROM fresh) WHERE rn = 1
    ), tot AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
        FROM bat GROUP BY doc_id
    ), kp AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(ct, ' ' ORDER BY chunk_id) AS new_text
        FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(tot.n_chunks, 0) AS BIGINT) AS n_chunks,
           CAST(coalesce(kp.n_kept, 0) AS BIGINT) AS n_kept,
           coalesce(kp.new_text, '') AS new_text
    FROM (SELECT doc_id FROM documents WHERE doc_id >= 400) d
    LEFT JOIN tot ON d.doc_id = tot.doc_id
    LEFT JOIN kp ON d.doc_id = kp.doc_id
    """,
)
def dedup_chunk_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-ingest passage dedup (`operators/dedup.
    chunk_dedup_incremental`): the batch (doc_id >= 400) dedups against
    the ingested corpus (doc_id < 400) represented ONLY by its chunk
    digests — one digest-keyed anti-join (historical text never moves)
    then the within-batch election and reassembly. The oracle replays
    it with text equality (sha256 equality == text equality)."""
    from usgs_lidar_spark.operators.dedup import (
        chunk_dedup_incremental,
        chunk_digests,
    )

    docs = _t(spark, sf_dir, "documents")
    seen = chunk_digests(docs.filter(F.col("doc_id") < 400), chunk_tokens=4)
    return chunk_dedup_incremental(
        docs.filter(F.col("doc_id") >= 400), seen, chunk_tokens=4
    )


@query(
    "sim_embedding_gram",
    oracle="""
    WITH q AS (
        SELECT list_transform(
                   embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 4096.0) AS BIGINT)
               ) AS v
        FROM embeddings
    ), idx AS (SELECT unnest(range(1, 65)) AS i),
    pairs AS (SELECT a.i AS i, b.i AS j FROM idx a, idx b WHERE b.i >= a.i)
    SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j,
           CAST(sum(v[p.i] * v[p.j]) AS BIGINT) AS g
    FROM q CROSS JOIN pairs p GROUP BY p.i, p.j
    """,
)
def sim_embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer Gram matrix of the (64-dim) embedding corpus
    (`operators/linalg.embed_gram_quantized`, qbits=12) — the
    distributed-PCA reduction: a numpy partial Gram per Arrow batch
    (the engine's one deliberate mapInPandas hot path — a
    batch-reducing kernel, not row-wise Python), d²-per-partition
    shuffle, BIGINT-exact under any partitioning. The oracle replays
    the quantized double loop; `pca_components`/`embed_pca_project`
    consume this reduction driver-side (d x d eigh) and project
    map-only."""
    from usgs_lidar_spark.operators.linalg import embed_gram_quantized

    return embed_gram_quantized(_t(spark, sf_dir, "embeddings"))


@query(
    "stats_poisson_bootstrap",
    oracle=f"""
    WITH reps AS (SELECT unnest(range(0, 32)) AS b),
    cells AS (
        SELECT r.b AS replicate, d.n_chars,
               (CASE WHEN u >= 790015083 THEN 1 ELSE 0 END
              + CASE WHEN u >= 1580030167 THEN 1 ELSE 0 END
              + CASE WHEN u >= 1975037709 THEN 1 ELSE 0 END
              + CASE WHEN u >= 2106706890 THEN 1 ELSE 0 END
              + CASE WHEN u >= 2139624185 THEN 1 ELSE 0 END) AS m
        FROM documents d CROSS JOIN reps r
        CROSS JOIN LATERAL (SELECT
            {_LEHMER_LONG(_FOLD64("d.doc_id") + " * 131 + r.b")}
            AS u) h
    ), agg AS (
        SELECT replicate, CAST(sum(m) AS BIGINT) AS n_eff,
               CAST(sum(m * n_chars) AS BIGINT) AS value_sum
        FROM cells WHERE m > 0 GROUP BY replicate
    )
    SELECT CAST(r.b AS BIGINT) AS replicate,
           CAST(coalesce(a.n_eff, 0) AS BIGINT) AS n_eff,
           CAST(coalesce(a.value_sum, 0) AS BIGINT) AS value_sum
    FROM reps r LEFT JOIN agg a ON r.b = a.replicate
    """,
)
def stats_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson bootstrap (`operators/stats.
    poisson_bootstrap`, B=32) of sum/count of n_chars over documents —
    the production substitute for with-replacement resampling at
    100 TB (Chamandy et al.): per-(row, replicate) Poisson(1)
    multiplicities from fixed integer inverse-CDF thresholds on the
    Lehmer hash, so every engine and partitioning draws the SAME
    resamples. One map-only explode (zero-multiplicity cells dropped
    before the shuffle) + one replicate-keyed map-combined aggregate:
    B partial rows per partition on the wire. Replicate means
    value_sum/n_eff are the CI inputs."""
    from usgs_lidar_spark.operators.stats import poisson_bootstrap

    return poisson_bootstrap(
        _t(spark, sf_dir, "documents"), "n_chars", "doc_id",
        n_replicates=32,
    )


@query(
    "pipe_budget_select",
    oracle="""
    WITH scored AS (
        SELECT doc_id, n_chars, CAST(n_chars % 37 AS BIGINT) AS score
        FROM documents
    ), ordered AS (
        SELECT doc_id, n_chars,
               sum(n_chars) OVER (ORDER BY score DESC, doc_id ASC
                                  ROWS UNBOUNDED PRECEDING) AS cum
        FROM scored
    )
    SELECT CAST(count(*) AS BIGINT) AS n_kept,
           CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS weight_kept,
           CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
    FROM ordered WHERE cum <= 30000
    """,
)
def pipe_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained greedy curation (`operators/ranking.
    budget_prefix_select`): fill a 30k-char budget with the
    best-scoring documents ((score DESC, doc_id ASC) order, synthetic
    integer score n_chars % 37). The global ordered prefix-sum is fully
    distributed (round 11): per-score totals range-bucketed by VALUE,
    descending bucket offsets broadcast back over a <=1024-row bounded
    collect, the boundary score + remaining budget as one 1-row max_by
    broadcast — no data-sized driver pull, no distinct-score ceiling,
    and only the single BOUNDARY score's rows flow through a window —
    never a single-task global window; the oracle IS that naive global
    window, proving the scalable form row-identical."""
    from usgs_lidar_spark.operators.ranking import budget_prefix_select

    docs = _t(spark, sf_dir, "documents").withColumn(
        "score", (F.col("n_chars") % 37).cast("long")
    )
    kept = budget_prefix_select(
        docs, "score", "n_chars", budget=30000
    )
    return kept.agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("weight_kept"),
        F.coalesce(F.sum("doc_id"), F.lit(0)).cast("long").alias("id_sum"),
    )


@query(
    "text_rp_embedding",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOK_LOWER_SQL}) AS w
        FROM documents WHERE length(trim(text)) > 0
    ), hashed AS (
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(w) + 1),
                                      i -> CAST(ascii(w[i]) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 1000000007) AS h
        FROM toks
    ), dims AS (SELECT unnest(range(0, 16)) AS dim),
    cells AS (
        SELECT doc_id, d.dim,
               CASE ({_LEHMER_LONG("h * 17 + d.dim")}) % 4
                    WHEN 0 THEN -1 WHEN 2 THEN 1 ELSE 0 END AS v
        FROM hashed CROSS JOIN dims d
    ), summed AS (
        SELECT doc_id, dim, CAST(sum(v) AS BIGINT) AS val
        FROM cells GROUP BY doc_id, dim
    )
    SELECT d.doc_id, CAST(dd.dim AS BIGINT) AS dim,
           CAST(coalesce(s.val, 0) AS BIGINT) AS val
    FROM documents d CROSS JOIN dims dd
    LEFT JOIN summed s ON d.doc_id = s.doc_id AND dd.dim = s.dim
    """,
)
def text_rp_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random-projection document embeddings
    (`operators/textquality.rp_doc_embedding`, 16 dims): sparse
    ternary Achlioptas rows drawn from the Lehmer hash of (token
    polyhash, dim) — a Johnson-Lindenstrauss sketch of token counts,
    exact-integer so featurization is engine/partition-reproducible
    (the text -> ANN bridge without model inference). Map-only until
    one (doc, dim)-keyed map-combined aggregate."""
    from usgs_lidar_spark.operators.textquality import rp_doc_embedding

    return rp_doc_embedding(_t(spark, sf_dir, "documents"), n_dims=16)


def _bpe_pack_oracle_sql(n_merges: int) -> str:
    """Oracle for `pipe_pack_by_bpe`: the unrolled trainer CTEs, the
    per-doc segmentation join (as in `text_bpe_tokenize`), then the
    same per-language packing window as `pipe_pack_sequences` — but
    over REAL tokenizer counts."""
    base = _bpe_oracle_sql(n_merges)
    ctes = base[: base.rindex("\n")]
    return (
        ctes
        + f"""
    , toks AS (
        SELECT doc_id, unnest({_TOK_LOWER_SQL}) AS w
        FROM documents WHERE length(trim(text)) > 0
    ), per AS (
        SELECT t.doc_id,
               CAST(sum(len(string_split(f.seq, ' '))) AS BIGINT) AS n_bpe
        FROM toks t JOIN seq{n_merges + 1} f USING (w)
        GROUP BY t.doc_id
    ), counts AS (
        SELECT d.doc_id, d.lang,
               CAST(coalesce(p.n_bpe, 0) AS BIGINT) AS n_bpe
        FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
    ), packed AS (
        SELECT doc_id, lang, n_bpe AS n_tokens,
               CAST(sum(n_bpe) OVER w - n_bpe AS BIGINT) AS token_start,
               CAST(sum(n_bpe) OVER w AS BIGINT) AS token_end
        FROM counts
        WINDOW w AS (PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT doc_id, lang, n_tokens, token_start,
           CAST(floor(token_start / 2048.0) AS BIGINT) AS pack_id,
           token_start % 2048 AS pack_offset,
           token_end > (floor(token_start / 2048.0) + 1) * 2048
               AS split_across
    FROM packed"""
    )


@query("pipe_pack_by_bpe", oracle=_bpe_pack_oracle_sql(4))
def pipe_pack_by_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing by REAL tokenizer counts: learn 4 BPE merges,
    segment every document (`bpe_apply` — a vocab-sized join, no merge
    logic on document rows), then run the per-language 2048-token
    packing window over the BPE counts instead of whitespace counts —
    the composition a pretraining loader actually executes (context
    budgets are in tokenizer tokens, not words). Same one-shuffle pack
    shape as `pipe_pack_sequences`."""
    from usgs_lidar_spark.operators.pipeline import pack_sequences
    from usgs_lidar_spark.operators.textquality import bpe_apply

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    counts = bpe_apply(docs, n_merges=4).select("doc_id", "n_bpe_tokens")
    with_counts = docs.join(counts, "doc_id").select(
        "doc_id", "lang", "n_bpe_tokens"
    )
    return pack_sequences(
        with_counts, "doc_id", "n_bpe_tokens", budget=2048,
        stream_col="lang",
    ).select(
        "doc_id", "lang", "n_tokens", "token_start", "pack_id",
        "pack_offset", "split_across",
    )


@query(
    "sim_kmeans_step",
    oracle="""
    WITH qe AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))
                   AS qv
        FROM embeddings
    ), cent AS (
        SELECT vec_id AS cid, qv AS qc,
               CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS nq
        FROM qe WHERE vec_id < 8
    ), dots AS (
        SELECT e.vec_id, e.qv, c.cid, c.nq,
               CAST(list_sum(list_transform(list_zip(e.qv, c.qc),
                                            p -> p[1] * p[2])) AS BIGINT)
                   AS qdot
        FROM qe e CROSS JOIN cent c
    ), assigned AS (
        SELECT vec_id, qv, cid FROM (
            SELECT vec_id, qv, cid,
                   row_number() OVER (PARTITION BY vec_id
                       ORDER BY CASE WHEN nq = 0 THEN 0.0
                                ELSE CAST(qdot AS DOUBLE)
                                     / sqrt(CAST(nq AS DOUBLE)) END DESC,
                                cid) AS rn
            FROM dots) WHERE rn = 1
    ), cells AS (
        SELECT cid, i AS dim, qv[i] AS q
        FROM assigned, unnest(range(1, len(qv) + 1)) AS t(i)
    )
    SELECT CAST(cid AS BIGINT) AS cid, CAST(dim AS BIGINT) AS dim,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(q) AS BIGINT) AS coord_sum_q
    FROM cells GROUP BY cid, dim
    """,
)
def sim_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed Lloyd step with bit-exact statistics
    (`operators/similarity.kmeans_step_exact`): quantized-argmax
    assignment to the 8 seed centroids on one scan, then per (cell,
    dim) occupancy + EXACT integer coordinate sums — k*dim rows out of
    a map-combined shuffle. The next centroid is the driver-side
    division of bounded numbers; the expensive distributed part of
    quantizer training is all-BIGINT and hash-stable."""
    from usgs_lidar_spark.operators.similarity import kmeans_step_exact

    emb = _t(spark, sf_dir, "embeddings")
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    ] or [(0, [0.0])]
    return kmeans_step_exact(emb, cents)


@query(
    "sim_kmeans_two_steps",
    oracle="""
    WITH qe AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))
                   AS qv
        FROM embeddings
    ), cent1 AS (
        SELECT vec_id AS cid, qv AS qc,
               CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS nq
        FROM qe WHERE vec_id < 8
    ), dots1 AS (
        SELECT e.vec_id, e.qv, c.cid, c.nq,
               CAST(list_sum(list_transform(list_zip(e.qv, c.qc),
                                            p -> p[1] * p[2])) AS BIGINT)
                   AS qdot
        FROM qe e CROSS JOIN cent1 c
    ), a1 AS (
        SELECT vec_id, qv, cid FROM (
            SELECT vec_id, qv, cid,
                   row_number() OVER (PARTITION BY vec_id
                       ORDER BY CASE WHEN nq = 0 THEN 0.0
                                ELSE CAST(qdot AS DOUBLE)
                                     / sqrt(CAST(nq AS DOUBLE)) END DESC,
                                cid) AS rn
            FROM dots1) WHERE rn = 1
    ), step1 AS (
        SELECT cid, i AS dim,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(qv[i]) AS BIGINT) AS cs
        FROM a1, unnest(range(1, len(qv) + 1)) AS t(i)
        GROUP BY cid, i
    ), cent2 AS (
        -- update: mean_q = double(cs)/n, c = mean_q / 2^20, then
        -- re-quantize floor(c * 2^20) — two correctly-rounded IEEE ops
        -- + an exponent shift, identical in any engine. Seeds with an
        -- empty cell would keep their old centroid; every seed cell is
        -- occupied here (the seed vector itself assigns to it).
        SELECT cid,
               list_transform(
                   list(CAST(cs AS DOUBLE) / n / 1048576.0 ORDER BY dim),
                   x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS qc
        FROM step1 GROUP BY cid
    ), cent2n AS (
        SELECT cid, qc,
               CAST(list_sum(list_transform(qc, v -> v * v)) AS BIGINT) AS nq
        FROM cent2
    ), dots2 AS (
        SELECT e.vec_id, e.qv, c.cid, c.nq,
               CAST(list_sum(list_transform(list_zip(e.qv, c.qc),
                                            p -> p[1] * p[2])) AS BIGINT)
                   AS qdot
        FROM qe e CROSS JOIN cent2n c
    ), a2 AS (
        SELECT vec_id, qv, cid FROM (
            SELECT vec_id, qv, cid,
                   row_number() OVER (PARTITION BY vec_id
                       ORDER BY CASE WHEN nq = 0 THEN 0.0
                                ELSE CAST(qdot AS DOUBLE)
                                     / sqrt(CAST(nq AS DOUBLE)) END DESC,
                                cid) AS rn
            FROM dots2) WHERE rn = 1
    )
    SELECT CAST(cid AS BIGINT) AS cid, CAST(i AS BIGINT) AS dim,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(qv[i]) AS BIGINT) AS coord_sum_q
    FROM a2, unnest(range(1, len(qv) + 1)) AS t(i)
    GROUP BY cid, i
    """,
)
def sim_kmeans_two_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two full Lloyd iterations — assign, update, re-assign — with the
    float feedback loop itself cross-engine exact
    (`operators/similarity.kmeans_two_steps_exact`): the centroid
    update is double(coord_sum_q)/n then a power-of-two exponent
    shift (two correctly-rounded IEEE ops, identical in Spark, DuckDB,
    Python), re-quantized with the rounding-free floor quantizer, so
    the ITERATION — the part float k-means cannot reproduce across
    engines — hashes stably. Only k*dim bounded numbers cross the
    driver between rounds.

    Oracle limitation (by construction, not a bug): the SQL twin does
    not model EMPTY round-1 cells (a centroid that attracts no vector
    keeps its old position in the engine; the oracle's update CTE would
    simply have no row to join). The 8 seed centroids here are distinct
    corpus vectors, each of which attracts at least itself, so no cell
    can be empty for this query; duplicate or adversarial seeds would
    need the engine-side `kmeans_two_steps_exact` empty-cell keep that
    `test_kmeans_two_steps_monotone_inertia_and_empty_cell_keep` pins."""
    from usgs_lidar_spark.operators.similarity import kmeans_two_steps_exact

    emb = _t(spark, sf_dir, "embeddings")
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    ] or [(0, [0.0])]
    return kmeans_two_steps_exact(emb, cents)


@query(
    "text_nb_train",
    oracle=f"""
    WITH toks AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
               unnest({_TOK_LOWER_SQL}) AS w
        FROM documents WHERE length(trim(text)) > 0
    ), feats AS (
        SELECT y,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(w) + 1),
                                      i -> CAST(ascii(w[i]) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 1000000007) % 64
                   AS feature_id
        FROM toks
    ), fc AS (
        SELECT feature_id,
               CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(sum(CASE WHEN y = 1 THEN 0 ELSE 1 END) AS BIGINT) AS b
        FROM feats GROUP BY feature_id
    ), tot AS (
        SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb
        FROM fc
    ), scored AS (
        SELECT feature_id,
               CAST((length(to_base(a + 1, 2)) - 1)
                  + (length(to_base(tb - b + 1, 2)) - 1)
                  - (length(to_base(b + 1, 2)) - 1)
                  - (length(to_base(ta - a + 1, 2)) - 1)
                  AS BIGINT) AS weight
        FROM fc CROSS JOIN tot
    )
    SELECT f.fid AS feature_id,
           CAST(coalesce(s.weight, 0) AS BIGINT) AS weight
    FROM (SELECT unnest(range(0, 64)) AS fid) f
    LEFT JOIN scored s ON f.fid = s.feature_id
    """,
)
def text_nb_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN the hashed-feature quality classifier in-engine
    (`operators/textquality.nb_train_bits`, labels lang='en' vs rest):
    Naive-Bayes log-odds weights in integer bits — one map-combined
    (feature, class) aggregate, no iteration, bit-exact in any engine;
    the output weight table is exactly what `hashed_feature_score`
    (the serving query) consumes, so train and serve close the loop
    in one feature space. Verified to fully separate a planted
    marker-token task in the unit test."""
    from usgs_lidar_spark.operators.textquality import nb_train_bits

    docs = _t(spark, sf_dir, "documents")
    return nb_train_bits(
        docs,
        F.when(F.col("lang") == "en", 1).otherwise(-1),
        n_features=64,
    )


@query(
    "dedup_simhash_portable",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOK_LOWER_SQL}) AS w
        FROM documents WHERE length(trim(text)) > 0
    ), hashed AS (
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(w) + 1),
                                      i -> CAST(ascii(w[i]) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 1000000007) AS h
        FROM toks
    ), cells AS (
        SELECT doc_id, j.bit,
               CASE WHEN ({_LEHMER_LONG("h * 67 + j.bit")}) % 2 = 1
                    THEN 1 ELSE -1 END AS v
        FROM hashed CROSS JOIN (SELECT unnest(range(0, 32)) AS bit) j
    ), bits AS (
        SELECT doc_id, bit, sum(v) AS s FROM cells GROUP BY doc_id, bit
    ), fp AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN s > 0
                             THEN (CAST(1 AS BIGINT) << bit)
                             ELSE 0 END) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id
    )
    SELECT d.doc_id, CAST(coalesce(fp.simhash, 0) AS BIGINT) AS simhash
    FROM documents d LEFT JOIN fp ON d.doc_id = fp.doc_id
    """,
)
def dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints under the HARD oracle
    (`operators/dedup.simhash_portable`, 32 bits): the hash family is
    the two-round Lehmer parity of (token polyhash, bit), reproducible
    in ANSI SQL — this closes the signal gap the xxhash64 SimHash pair
    necessarily carries (those stay golden-pinned; the portable family
    brings the SimHash TIER onto the driver's value-hash check). Same
    majority-sign semantics and the same scale shape: n_bits partials
    per doc on the wire, never text."""
    from usgs_lidar_spark.operators.dedup import simhash_portable

    return simhash_portable(_t(spark, sf_dir, "documents"), n_bits=32)


@query(
    "dedup_simhash_portable_pairs",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOK_LOWER_SQL}) AS w
        FROM documents WHERE length(trim(text)) > 0
    ), hashed AS (
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(w) + 1),
                                      i -> CAST(ascii(w[i]) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 1000000007) AS h
        FROM toks
    ), cells AS (
        SELECT doc_id, j.bit,
               CASE WHEN ({_LEHMER_LONG("h * 67 + j.bit")}) % 2 = 1
                    THEN 1 ELSE -1 END AS v
        FROM hashed CROSS JOIN (SELECT unnest(range(0, 32)) AS bit) j
    ), bits AS (
        SELECT doc_id, bit, sum(v) AS s FROM cells GROUP BY doc_id, bit
    ), fp AS (
        SELECT d.doc_id,
               CAST(coalesce(f.sh, 0) AS BIGINT) AS simhash
        FROM documents d LEFT JOIN (
            SELECT doc_id,
                   sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit)
                            ELSE 0 END) AS sh
            FROM bits GROUP BY doc_id) f ON d.doc_id = f.doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dedup_simhash_portable_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup DETECTION under the hard oracle
    (`operators/dedup.simhash_portable_near_dup_pairs`): pigeonhole
    block join over portable 32-bit fingerprints + popcount verify —
    the plan never compares all pairs (candidates come from the
    (block, value) equi-self-join), while the oracle IS the exact
    all-pairs Hamming scan, so the driver's value hash proves the
    blocking lossless at max_hamming < n_blocks."""
    from usgs_lidar_spark.operators.dedup import (
        simhash_portable_near_dup_pairs,
    )

    return simhash_portable_near_dup_pairs(
        _t(spark, sf_dir, "documents"), n_bits=32, max_hamming=3, n_blocks=4
    )


@query("sim_gram_from_store", oracle=ORACLE["sim_embedding_gram"])
def sim_gram_from_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gram reduction served from a persisted additive store —
    SAME oracle as `sim_embedding_gram` (access path, not semantics,
    the `search_bm25_from_index` pattern): `write_gram_store` appends
    per-batch integer moment partials (no derived state, no sidecar —
    additivity makes the store append-only crash-safe by construction)
    and the read aggregates d*(d+1)/2 + d + 1 bounded rows instead of
    scanning the corpus. Builds once into the per-(sf_dir, snapshot)
    cache path; steady-state runs measure serving."""
    from usgs_lidar_spark.operators.linalg import (
        read_gram_store,
        write_gram_store,
    )

    path, complete = _cached_index_path(
        sf_dir, "gram_store", "embeddings", ""
    )
    if not complete:
        import os

        write_gram_store(_t(spark, sf_dir, "embeddings"), path)
        # write_gram_store's single write ends with parquet's _SUCCESS
        # at the root — the completeness marker _cached_index_path
        # checks when marker_sidecar is ''.
        assert os.path.exists(os.path.join(path, "_SUCCESS"))
    return (
        read_gram_store(spark, path)
        .filter((F.col("i") >= 1) & (F.col("j") >= 1))
        .select("i", "j", "g")
    )


@query(
    "pipe_end_to_end_v5",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, {_TOK_LOWER_SQL} AS tk
        FROM documents WHERE length(trim(text)) > 0
    ), slots AS (
        SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
        FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
              FROM t WHERE len(tk) >= 2)
    ), bc AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS bc
        FROM slots GROUP BY w1, w2
    ), ctx AS (
        SELECT w1, CAST(sum(bc) AS BIGINT) AS ctx FROM bc GROUP BY w1
    ), v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM bc),
    surp AS (
        SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum((length(to_base(c.ctx + v.v, 2)) - 1)
                      - (length(to_base(b.bc + 1, 2)) - 1)) AS BIGINT)
                   AS bits
        FROM slots s JOIN bc b USING (w1, w2) JOIN ctx c USING (w1)
        CROSS JOIN v GROUP BY s.doc_id
    ),
    -- stage 1: keep docs whose mean surprisal is under 5.5 bits/bigram
    -- (integer cross-multiply; docs with < 2 tokens pass trivially)
    lm_kept AS (
        SELECT d.doc_id, d.lang, d.text
        FROM documents d LEFT JOIN surp s ON d.doc_id = s.doc_id
        WHERE coalesce(s.bits, 0) * 10 <= coalesce(s.n_bigrams, 0) * 55
    ),
    -- stage 2: passage-dedup the survivors (election among survivors
    -- only) and reassemble
    kt AS (
        SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS tk
        FROM lm_kept WHERE length(trim(text)) > 0
    ), ch AS (
        SELECT doc_id, lang, CAST(s // 4 AS BIGINT) AS chunk_id,
               array_to_string(list_slice(tk, s + 1, s + 4), ' ') AS ct
        FROM (SELECT doc_id, lang, tk, unnest(range(0, len(tk), 4)) AS s
              FROM kt)
    ), kept AS (
        SELECT doc_id, lang, chunk_id, ct FROM (
            SELECT doc_id, lang, chunk_id, ct,
                   row_number() OVER (PARTITION BY ct
                                      ORDER BY doc_id, chunk_id) AS rn
            FROM ch) WHERE rn = 1
    ), rebuilt AS (
        SELECT l.doc_id, l.lang,
               coalesce(k.new_text, '') AS new_text
        FROM lm_kept l LEFT JOIN (
            SELECT doc_id, string_agg(ct, ' ' ORDER BY chunk_id) AS new_text
            FROM kept GROUP BY doc_id) k ON l.doc_id = k.doc_id
    ),
    -- stage 3: classifier score over the REASSEMBLED text
    weights AS (
        SELECT CAST(f AS BIGINT) AS feature_id,
               CAST({_LEHMER_LONG("f")} % 2001 - 1000 AS BIGINT) AS weight
        FROM (SELECT unnest(range(0, 256)) AS f)
    ), rtoks AS (
        SELECT doc_id, lang,
               unnest(list_transform(
                   regexp_split_to_array(trim(new_text), '\\s+'),
                   x -> lower(x))) AS w
        FROM rebuilt WHERE length(trim(new_text)) > 0
    ), scored AS (
        SELECT r.doc_id, r.lang,
               CAST(coalesce(sum(w2.weight), 0) AS BIGINT) AS score
        FROM (SELECT doc_id, lang,
                     list_reduce(
                         list_prepend(CAST(0 AS BIGINT),
                             list_transform(range(1, length(w) + 1),
                                            i -> CAST(ascii(w[i]) AS BIGINT))),
                         (acc, x) -> (acc * 31 + x) % 1000000007) % 256
                         AS feature_id
              FROM rtoks) r
        LEFT JOIN weights w2 USING (feature_id)
        GROUP BY r.doc_id, r.lang
    )
    -- per-language report over the full chain
    SELECT r.lang,
           CAST(count(*) AS BIGINT) AS n_after_lm,
           CAST(sum(CASE WHEN length(r.new_text) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_text,
           CAST(coalesce(sum(len(string_split_regex(trim(r.new_text),
                                                    '\\s+'))) FILTER (
                    WHERE length(trim(r.new_text)) > 0), 0) AS BIGINT)
               AS tokens_after_dedup,
           CAST(coalesce(sum(s.score), 0) AS BIGINT) AS score_sum
    FROM rebuilt r LEFT JOIN scored s ON r.doc_id = s.doc_id
    GROUP BY r.lang
    """,
)
def pipe_end_to_end_v5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed pipeline v5 — the round-8 signals CHAINED, each stage
    consuming the previous one's output: integer bigram-LM filter
    (mean surprisal < 5.5 bits/bigram, cross-multiplied — no
    division), passage-dedup + reassembly over the SURVIVORS (the
    election runs on the filtered corpus), hashed-feature classifier
    scoring over the REASSEMBLED text, rolled up per language. Pins
    that the quality, dedup, and classifier tiers compose — the v3/v4
    precedent extended to the round-8 operators."""
    from usgs_lidar_spark.functions.textstats import token_count
    from usgs_lidar_spark.operators.dedup import chunk_dedup_docs
    from usgs_lidar_spark.operators.pipeline import portable_hash_long
    from usgs_lidar_spark.operators.textquality import (
        bigram_surprisal,
        hashed_feature_score,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    surp = bigram_surprisal(docs)
    # Stage boundaries are localCheckpoint-pinned: lm_kept's lineage
    # contains the whole LM filter and is referenced 3x downstream
    # (chunk election, reassembly base, report), rebuilt 2x (classifier
    # + final join) — without the pins the un-replanned NO_AQE physical
    # tree re-executes the chain per reference and OOM'd a vanilla-heap
    # session at sf0.01 (observed live; AQE masked it by replanning).
    # Materializing between stages is also what a production pipeline
    # does — each stage's output IS a dataset.
    lm_kept = (
        docs.join(surp, "doc_id", "left")
        .filter(
            F.coalesce("surprisal_bits", F.lit(0)) * 10
            <= F.coalesce("n_bigrams", F.lit(0)) * 55
        )
        .select("doc_id", "lang", "text")
        .localCheckpoint(eager=False)
    )
    rebuilt = (
        lm_kept.select("doc_id", "lang")
        .join(
            chunk_dedup_docs(lm_kept, chunk_tokens=4).select(
                "doc_id", "new_text"
            ),
            "doc_id",
        )
        .localCheckpoint(eager=False)
    )
    weights = spark.range(256).select(
        F.col("id").cast("long").alias("feature_id"),
        (portable_hash_long(F.col("id")) % 2001 - 1000)
        .cast("long")
        .alias("weight"),
    )
    scored = hashed_feature_score(
        rebuilt, weights, n_features=256, text_col="new_text"
    ).select("doc_id", "score")
    return (
        rebuilt.join(scored, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_after_lm"),
            F.sum(F.when(F.length("new_text") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_with_text"),
            F.sum(
                F.when(
                    F.length(F.trim("new_text")) > 0,
                    token_count("new_text"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("tokens_after_dedup"),
            F.coalesce(F.sum("score"), F.lit(0))
            .cast("long")
            .alias("score_sum"),
        )
    )


@query(
    "pipe_end_to_end_v6",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
        FROM documents WHERE length(trim(text)) > 0
    ), ch AS (
        SELECT doc_id, CAST(s // 4 AS BIGINT) AS chunk_id,
               array_to_string(list_slice(tk, s + 1, s + 4), ' ') AS ct
        FROM (SELECT doc_id, tk, unnest(range(0, len(tk), 4)) AS s FROM t)
    ), ranked AS (
        SELECT doc_id, chunk_id, ct,
               row_number() OVER (PARTITION BY ct
                                  ORDER BY doc_id, chunk_id) AS rn
        FROM ch
    ), kept AS (SELECT doc_id, chunk_id, ct FROM ranked WHERE rn = 1),
    tot AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
        FROM ch GROUP BY doc_id
    ), kp AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(ct, ' ' ORDER BY chunk_id) AS new_text
        FROM kept GROUP BY doc_id
    ), alive AS (
        SELECT tot.doc_id, tot.n_chunks, kp.n_kept,
               CASE WHEN trim(kp.new_text) = '' THEN 0
                    ELSE len(string_split_regex(trim(kp.new_text), '\s+'))
                    END AS n_tokens,
               {_LEHMER_STREAM("tot.doc_id", 8)} AS pack_stream
        FROM tot JOIN kp ON tot.doc_id = kp.doc_id
        WHERE kp.n_kept > 0
    ), packed AS (
        SELECT doc_id, n_chunks, n_kept, pack_stream,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT)
                   AS token_start,
               CAST(sum(n_tokens) OVER w AS BIGINT) AS token_end
        FROM alive
        WINDOW w AS (PARTITION BY pack_stream ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT doc_id, n_chunks, n_kept, pack_stream, n_tokens, token_start,
           CAST(floor(token_start / 512.0) AS BIGINT) AS pack_id,
           token_start % 512 AS pack_offset,
           token_end > (floor(token_start / 512.0) + 1) * 512
               AS split_across
    FROM packed
    """,
)
def pipe_end_to_end_v6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed pipeline v6 — the INGEST path: cross-document passage
    dedup + reassembly (`chunk_dedup_docs`, 4-token chunks), drop docs
    whose every chunk lost election, then pack the REASSEMBLED texts
    into 512-token training sequences over 8 deterministic Lehmer
    streams (`pack_sequences`). This is the batch twin of the
    exactly-once streaming ingest (`streaming/ingest.py`): the
    crash-restart parity test pins that draining the foreachBatch
    ingest and packing its output reproduces THIS query bit-for-bit,
    so the oracle here hard-checks the streaming composition too.
    Scale shape: digest-keyed election (text never shuffles twice),
    one stream-keyed window for packing — no global sort."""
    from usgs_lidar_spark.functions.textstats import token_count
    from usgs_lidar_spark.operators.dedup import chunk_dedup_docs
    from usgs_lidar_spark.operators.pipeline import pack_sequences

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ded = chunk_dedup_docs(d, chunk_tokens=4).filter(F.col("n_kept") > 0)
    return pack_sequences(
        ded.select("doc_id", "n_chunks", "n_kept", "new_text"),
        "doc_id",
        token_count("new_text"),
        budget=512,
        n_streams=8,
    ).select(
        "doc_id", "n_chunks", "n_kept", "pack_stream", "n_tokens",
        "token_start", "pack_id", "pack_offset", "split_across",
    )


@query(
    "text_rules_filter",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\s+') END AS t
        FROM documents
    ), s AS (
        SELECT doc_id,
               CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(coalesce(list_sum(list_transform(t, x -> length(x))), 0)
                    AS BIGINT) AS total_chars,
               CAST(len(list_filter(t, x -> list_contains(
                    ['the','and','of','to','in','is','that','it'],
                    lower(x)))) AS BIGINT) AS n_stop_hits
        FROM toks
    )
    SELECT doc_id, n_tokens, total_chars, n_stop_hits,
           n_tokens BETWEEN 50 AND 100000 AS r_word_count,
           3 * n_tokens <= total_chars AND total_chars <= 10 * n_tokens
               AS r_mean_word_len,
           n_stop_hits >= 2 AS r_stop_words,
           (CAST(n_tokens BETWEEN 50 AND 100000 AS INTEGER)
            + CAST(3 * n_tokens <= total_chars
                   AND total_chars <= 10 * n_tokens AS INTEGER)
            + CAST(n_stop_hits >= 2 AS INTEGER)) = 3 AS keep
    FROM s
    """,
)
def text_rules_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document-quality RULES filter (Rae et al. 2021,
    MassiveText §A.1.1, adapted to the signals this corpus carries):
    per-doc hard rules — 50 <= word count <= 100,000; mean word length
    in [3, 10] (CROSS-MULTIPLIED as 3n <= chars <= 10n, so the decision
    is pure BIGINT comparison, no division anywhere); >= 2 stop-word
    hits — plus the conjunction as `keep`. Every rule column is emitted
    (the curation-audit form: you tune rules by looking at what each
    one rejects, not just the survivor set). Map-only, zero shuffle;
    at sf0.01 the rules reject 223/500, 0/500, and 276/500 docs
    respectively — real discrimination, not a pass-through."""
    t = F.expr(
        r"CASE WHEN trim(text) = '' THEN array() "
        r"ELSE split(trim(text), '\\s+') END"
    )
    stop = F.array([F.lit(w) for w in
                    ["the", "and", "of", "to", "in", "is", "that", "it"]])
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        F.coalesce(
            F.aggregate(
                F.transform(t, lambda x: F.length(x).cast("long")),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            ),
            F.lit(0).cast("long"),
        ).alias("total_chars"),
        F.size(
            F.filter(t, lambda x: F.array_contains(stop, F.lower(x)))
        ).cast("long").alias("n_stop_hits"),
    )
    r_count = (F.col("n_tokens") >= 50) & (F.col("n_tokens") <= 100000)
    r_len = (F.lit(3) * F.col("n_tokens") <= F.col("total_chars")) & (
        F.col("total_chars") <= F.lit(10) * F.col("n_tokens")
    )
    r_stop = F.col("n_stop_hits") >= 2
    return d.select(
        "doc_id",
        "n_tokens",
        "total_chars",
        "n_stop_hits",
        r_count.alias("r_word_count"),
        r_len.alias("r_mean_word_len"),
        r_stop.alias("r_stop_words"),
        (r_count & r_len & r_stop).alias("keep"),
    )


@query(
    "dedup_source_overlap",
    oracle="""
    WITH sh0 AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(length(text) - 7, 0) + 1),
                       i -> substr(text, CAST(i AS INTEGER), 8))) AS shingle
            FROM documents)
    ), cap AS (
        SELECT greatest(1, CAST(ceil(0.04 * count(DISTINCT doc_id))
                                AS BIGINT)) AS max_df
        FROM sh0
    ), freq AS (
        SELECT shingle FROM sh0, cap
        GROUP BY shingle, max_df HAVING count(*) <= max_df
    ), ssh AS (
        SELECT DISTINCT d.source AS g, s.shingle
        FROM sh0 s JOIN freq USING (shingle)
        JOIN documents d USING (doc_id)
    ), sizes AS (
        SELECT g, CAST(count(*) AS BIGINT) AS n_sh FROM ssh GROUP BY g
    ), inter AS (
        SELECT a.g AS src_a, b.g AS src_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM ssh a JOIN ssh b ON a.shingle = b.shingle AND a.g < b.g
        GROUP BY 1, 2
    )
    SELECT src_a, src_b, n_shared, sa.n_sh AS n_a, sb.n_sh AS n_b,
           CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared)
               AS jaccard
    FROM inter
    JOIN sizes sa ON sa.g = src_a
    JOIN sizes sb ON sb.g = src_b
    """,
)
def dedup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix
    (operators/dedup.source_overlap_matrix): per source pair, the
    Jaccard of their df-capped char-8 shingle sets — "how much does
    source A republish source B", the question that decides which
    source to DROP when near-dup clusters straddle origins. The
    doc-level df cap runs before source aggregation (a stop-shingle in
    every source is noise, not overlap), the self-join rides the same
    capped key as the pairwise dedups, and the output is bounded by
    #sources². Counts exact, Jaccard one double division.

    The cap is the SCALE-STABLE fractional form (max_df_frac=0.04: drop
    shingles in >4% of shingle-bearing docs — ceil(0.04 * n) = 20 at
    sf0.01, the old absolute cap exactly, but invariant in MEANING as
    the corpus grows; SCALE.md measured the absolute max_df=20 emitting
    89 pairs at 10x vs 190 at 1x because rotation-shared shingles drift
    past a fixed df). The fraction resolves with zero extra corpus
    passes (`char_shingles` pins the distinct pairs once and rides the
    denominator in on a one-row broadcast)."""
    from usgs_lidar_spark.operators.dedup import source_overlap_matrix

    return source_overlap_matrix(
        _t(spark, sf_dir, "documents"),
        "text", "doc_id", "source", k=8, max_df=None, max_df_frac=0.04,
    )


@query(
    "pipe_dsir_select",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, unnest({_TOK_LOWER_SQL}) AS w
        FROM documents WHERE length(trim(text)) > 0
    ), feats AS (
        SELECT doc_id, lang,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(w) + 1),
                                      i -> CAST(ascii(w[i]) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 1000000007) % 64 AS f
        FROM toks
    ), fc AS (
        SELECT g.fid AS f,
               CAST(coalesce(cr, 0) AS BIGINT) AS cr,
               CAST(coalesce(ct, 0) AS BIGINT) AS ct
        FROM (SELECT unnest(range(0, 64)) AS fid) g
        LEFT JOIN (
            SELECT f, count(*) AS cr,
                   sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
            FROM feats GROUP BY f) c ON g.fid = c.f
    ), tot AS (
        SELECT CAST(sum(cr) AS BIGINT) AS tr,
               CAST(sum(ct) AS BIGINT) AS tt
        FROM fc
    ), wts AS (
        SELECT f AS feature_id,
               CAST((length(to_base(ct + 1, 2)) - 1)
                  + (length(to_base(tr + 64, 2)) - 1)
                  - (length(to_base(cr + 1, 2)) - 1)
                  - (length(to_base(tt + 64, 2)) - 1) AS BIGINT) AS weight
        FROM fc CROSS JOIN tot
    ), scored AS (
        SELECT t.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(w2.weight) AS BIGINT) AS dsir_bits
        FROM feats t JOIN wts w2 ON t.f = w2.feature_id
        GROUP BY t.doc_id
    ), ranked AS (
        SELECT doc_id, n_tokens, dsir_bits,
               CAST(row_number() OVER (ORDER BY dsir_bits, doc_id)
                    AS BIGINT) AS r,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM scored
    )
    SELECT doc_id, n_tokens, dsir_bits, r * 4 > 3 * n AS keep
    FROM ranked
    """,
)
def pipe_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023) end to end, exact-integer:
    train IMPORTANCE weights from the target-vs-raw hashed-feature
    distributions (`operators/textquality.dsir_weights_bits`, target =
    the lang='en' slice standing in for a trusted quality corpus),
    score every token-bearing document with the per-token summed
    log-ratio (`hashed_feature_score` — the serving pass is shared with
    the supervised classifier, same feature space by construction), and
    RESAMPLE by keeping the top quartile under the exact distributed
    global rank on (dsir_bits, doc_id) — `ranking.global_rank`, no
    single-task window; the corpus total rides a one-row broadcast so
    the keep decision is a lazy integer comparison (r*4 > 3n). Output
    is every TOKEN-BEARING doc with its weight and the keep verdict —
    zero-token (empty/whitespace-only) documents are excluded BEFORE
    the rank: they carry no feature evidence, can never be selected as
    training data, and counting them in the rank denominator would
    shift every real doc's quartile cut by the corpus's junk fraction
    (n_tokens > 0 is exactly the oracle's length(trim(text)) > 0 —
    whitespace tokenization yields a token iff trimmed text is
    non-empty)."""
    from usgs_lidar_spark.operators.ranking import global_rank
    from usgs_lidar_spark.operators.textquality import (
        dsir_weights_bits,
        hashed_feature_score,
    )

    d = _t(spark, sf_dir, "documents")
    weights = dsir_weights_bits(d, F.col("lang") == "en", n_features=64)
    # Pin: `scored`'s lineage (explode + broadcast-weight join over the
    # corpus) is referenced by BOTH the rank path and the count rider —
    # unpinned, the un-replanned NO_AQE tree executes it twice (the
    # pipe_end_to_end_v5 lesson).
    scored = (
        hashed_feature_score(d, weights, n_features=64)
        .filter(F.col("n_tokens") > 0)
        .select("doc_id", "n_tokens", F.col("score").alias("dsir_bits"))
        .localCheckpoint(eager=False)
    )
    ranked = global_rank(scored, ["dsir_bits", "doc_id"], rank_col="__r")
    n = scored.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    return ranked.crossJoin(F.broadcast(n)).select(
        "doc_id",
        "n_tokens",
        "dsir_bits",
        (F.col("__r") * 4 > 3 * F.col("__n")).alias("keep"),
    )


@query(
    "stats_bootstrap_by_lang",
    oracle=f"""
    WITH reps AS (SELECT unnest(range(0, 16)) AS b),
    cells AS (
        SELECT d.lang, r.b AS replicate, d.n_chars,
               (CASE WHEN u >= 790015083 THEN 1 ELSE 0 END
              + CASE WHEN u >= 1580030167 THEN 1 ELSE 0 END
              + CASE WHEN u >= 1975037709 THEN 1 ELSE 0 END
              + CASE WHEN u >= 2106706890 THEN 1 ELSE 0 END
              + CASE WHEN u >= 2139624185 THEN 1 ELSE 0 END) AS m
        FROM documents d CROSS JOIN reps r
        CROSS JOIN LATERAL (SELECT
            {_LEHMER_LONG(_FOLD64("d.doc_id") + " * 131 + r.b")}
            AS u) h
    ), agg AS (
        SELECT lang, replicate, CAST(sum(m) AS BIGINT) AS n_eff,
               CAST(sum(m * n_chars) AS BIGINT) AS value_sum
        FROM cells WHERE m > 0 GROUP BY lang, replicate
    )
    SELECT g.lang AS "group", CAST(r.b AS BIGINT) AS replicate,
           CAST(coalesce(a.n_eff, 0) AS BIGINT) AS n_eff,
           CAST(coalesce(a.value_sum, 0) AS BIGINT) AS value_sum
    FROM (SELECT DISTINCT lang FROM documents) g
    CROSS JOIN reps r
    LEFT JOIN agg a ON g.lang = a.lang AND r.b = a.replicate
    """,
)
def stats_bootstrap_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Poisson-bootstrap replicates of sum/count of
    n_chars (`operators/stats.poisson_bootstrap_grouped`, B=16): the
    per-source CI report — same deterministic multiplicities as the
    global bootstrap (slicing by group does not perturb any row's
    draw), one map-only pass, |groups| x B partials per partition."""
    from usgs_lidar_spark.operators.stats import poisson_bootstrap_grouped

    return poisson_bootstrap_grouped(
        _t(spark, sf_dir, "documents"), "lang", "n_chars", "doc_id",
        n_replicates=16,
    )
