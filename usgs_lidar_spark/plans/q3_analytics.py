"""Round-6+ analytics: events funnels/cohorts/outliers, CDC, incremental rollups, DQ, multimodal RMS, skew, spatial joins, basket pairs.

Mechanically split from plans/queries.py (round 11) — query function
source text is byte-identical to the single-file original, so every
REPLICA fingerprint (sha256 of query source + oracle SQL) is unchanged.
Registration happens at import time via `registry.query`; the import
order is fixed by plans/queries.py (the aggregator), preserving the
original definition order and every backward ORACLE[...] reference.
"""

from __future__ import annotations

from usgs_lidar_spark.plans.registry import (
    DEC_SUM,
    DataFrame,
    F,
    SparkSession,
    Window,
    _t,
    dec_avg,
    dec_sum,
    query,
)
from usgs_lidar_spark.plans.q1_classic import (
    _SHINGLE_CTE,
)
from usgs_lidar_spark.plans.q2_ann_pipeline import (
    _LEHMER_STREAM,
)

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
# Round 14: perceptual image near-dup — the one LLM-pipeline modality
# (text, embeddings, binary-exact all had one) without a near-dup
# operator until now. dHash over a deterministic byte-grid decode
# (`fake_dhash_image` — the PIL-gated `dhash_image` computes the SAME
# band packing over real pixels), then Hamming-banded pair search.
# =====================================================================


def _dhash_band_sql(q: int, src: str = "smp") -> str:
    """DuckDB expression for dHash band ``q`` over a 72-sample list
    ``src`` (1-indexed): comparison j = 16q+m sits at grid row j//8,
    col j%8 -> samples (j//8)*9 + j%8 + 1 vs + 2 — the exact packing
    of multimodal/binary_ops._pack_dhash_bands."""
    return f"""CAST(list_sum(list_transform(range(0, 16), j ->
        CASE WHEN {src}[CAST(((16*{q}+j)//8)*9 + ((16*{q}+j)%8) + 1 AS INTEGER)]
                > {src}[CAST(((16*{q}+j)//8)*9 + ((16*{q}+j)%8) + 2 AS INTEGER)]
             THEN (1 << CAST(j AS INTEGER)) ELSE 0 END)) AS BIGINT)"""


#: Shared oracle CTE: media table -> per-media dHash bands (the fake
#: byte-grid decode: sample k of 72 is byte (k*n)//72, ord(substr())
#: equals the byte for these ASCII payloads — the mm_audio_rms
#: convention).
_DHASH_CTE = f"""s AS (
  SELECT media_id, length(text) AS n,
         CASE WHEN length(text) = 0 THEN NULL
              ELSE list_transform(range(0, 72),
                 k -> ord(substr(text,
                          CAST(k * length(text) // 72 AS INTEGER) + 1, 1)))
         END AS smp
  FROM m
), h AS (
  SELECT media_id,
         CASE WHEN n = 0 THEN 0 ELSE {_dhash_band_sql(0)} END AS b0,
         CASE WHEN n = 0 THEN 0 ELSE {_dhash_band_sql(1)} END AS b1,
         CASE WHEN n = 0 THEN 0 ELSE {_dhash_band_sql(2)} END AS b2,
         CASE WHEN n = 0 THEN 0 ELSE {_dhash_band_sql(3)} END AS b3
  FROM s
)"""


@query(
    "mm_dhash_fingerprint",
    oracle=f"""
    WITH m AS (SELECT doc_id AS media_id, text FROM documents),
    {_DHASH_CTE}
    SELECT media_id, b0, b1, b2, b3 FROM h
    """,
)
def mm_dhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual difference-hash fingerprints over media payloads
    (multimodal/binary_ops.fake_dhash_image — the deterministic
    byte-grid decode tier; `dhash_image` is the PIL-gated real-pixel
    tier with the identical band packing): each payload downsamples to
    an 8x9 grid and 64 adjacent comparisons pack into four 16-bit
    bands. Map-only (payloads never shuffle; 4 small longs per item
    leave the scan stage), and every band value is pure integer
    arithmetic on the bytes — the oracle replays it with ord/substr
    list arithmetic, so the hash itself is cross-engine hash-checked,
    not just its downstream effects."""
    from usgs_lidar_spark.multimodal import fake_dhash_image, to_media_table

    d = _t(spark, sf_dir, "documents")
    return fake_dhash_image(to_media_table(d, "doc_id", "text"))


@query(
    "mm_near_dedup",
    oracle=f"""
    WITH RECURSIVE m AS (
        SELECT doc_id AS media_id, text FROM documents
        UNION ALL
        -- near re-uploads: every 7th payload reappears under a new id
        -- with ONE middle byte swapped for '~' — byte-different (exact
        -- content dedup misses it), perceptually ~1 sample of 72 off.
        SELECT doc_id + 100000 AS media_id,
               substr(text, 1, length(text) // 2)
                 || '~' || substr(text, length(text) // 2 + 2) AS text
        FROM documents WHERE doc_id % 7 = 0
    ),
    {_DHASH_CTE},
    pairs AS (
      SELECT a.media_id AS id_a, b.media_id AS id_b
      FROM h a JOIN h b
        ON a.media_id < b.media_id
       AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
      WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
          + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
    ), edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                 UNION SELECT id_b AS u, id_a AS v FROM pairs),
    walk(id, reach) AS (
        SELECT media_id, media_id FROM m
        UNION
        SELECT w.id, e.v FROM walk w JOIN edges e ON e.u = w.reach
    ),
    cc AS (SELECT id AS media_id, min(reach) AS cluster_id
           FROM walk GROUP BY id),
    csize AS (SELECT cluster_id, count(*) AS cluster_size
              FROM cc GROUP BY cluster_id)
    SELECT cc.media_id, CAST(cc.cluster_id AS BIGINT) AS cluster_id,
           CAST(csize.cluster_size AS BIGINT) AS cluster_size,
           cc.media_id = cc.cluster_id AS is_kept
    FROM cc JOIN csize USING (cluster_id)
    """,
)
def mm_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual NEAR-dup dedup over image payloads — the composition
    `fake_dhash_image` -> `near_dup_media_by_dhash` (Hamming-banded
    pairs, LOSSLESS at radius 3 by pigeonhole over the four 16-bit
    bands) -> min-label connected components -> min-id keeper. The
    media table is documents' bytes plus a re-upload slice where ONE
    middle byte changed: exact content dedup (`mm_dedup_media`'s md5)
    can never catch those — this operator exists for exactly that gap,
    and at sf0.01 every one of the 72 perturbed re-uploads must land
    back in its original's cluster (572 rows, 500 keepers). Payloads
    never shuffle: the hash pass is map-only, the pair search moves
    (id, 4 bands) rows through band-keyed buckets, and CC moves labels.
    The oracle replays hash, banding, radius, and components exactly
    (recursive walk CTE), so keeper decisions hash cross-engine."""
    from usgs_lidar_spark.multimodal import (
        fake_dhash_image,
        near_dup_media_by_dhash,
        to_media_table,
    )
    from usgs_lidar_spark.operators.graph import collapse_clusters

    d = _t(spark, sf_dir, "documents")
    n = F.length("text")
    reup = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, F.floor(n / 2).cast("int")),
            F.lit("~"),
            F.expr(
                "substring(text, CAST(length(text) / 2 AS INT) + 2)"
            ),
        ).alias("text"),
    )
    media = to_media_table(
        d.select("doc_id", "text").unionByName(reup), "doc_id", "text"
    )
    hashes = fake_dhash_image(media)
    pairs = near_dup_media_by_dhash(hashes, max_hamming=3)
    return collapse_clusters(
        media.select(F.col("media_id")), pairs,
        id_col="media_id", pair_a="id_a", pair_b="id_b",
    )


def _dhash_band_sql_wide(q: int, n_bands: int, src: str = "smp") -> str:
    """`_dhash_band_sql` generalized to an 8 x (2*n_bands+1) grid: the
    comparison index j = 16q+m sits at grid row j // (2*n_bands), col
    j % (2*n_bands) — exact mirror of
    multimodal/binary_ops._pack_dhash_bands_n."""
    pr, cols = 2 * n_bands, 2 * n_bands + 1
    return f"""CAST(list_sum(list_transform(range(0, 16), j ->
        CASE WHEN {src}[CAST(((16*{q}+j)//{pr})*{cols}
                            + ((16*{q}+j)%{pr}) + 1 AS INTEGER)]
                > {src}[CAST(((16*{q}+j)//{pr})*{cols}
                             + ((16*{q}+j)%{pr}) + 2 AS INTEGER)]
             THEN (1 << CAST(j AS INTEGER)) ELSE 0 END)) AS BIGINT)"""


#: 128-bit (8-band) dHash CTE over media table m — 136 byte-grid samples.
_DHASH8_CTE = f"""s AS (
  SELECT media_id, length(text) AS n,
         CASE WHEN length(text) = 0 THEN NULL
              ELSE list_transform(range(0, 136),
                 k -> ord(substr(text,
                          CAST(k * length(text) // 136 AS INTEGER) + 1, 1)))
         END AS smp
  FROM m
), h AS (
  SELECT media_id,
         {", ".join(
             f"CASE WHEN n = 0 THEN 0 ELSE {_dhash_band_sql_wide(q, 8)} END"
             f" AS b{q}"
             for q in range(8)
         )}
  FROM s
)"""


@query(
    "mm_near_dedup_wide",
    oracle=f"""
    WITH RECURSIVE m AS (
        SELECT doc_id AS media_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS media_id,
               substr(text, 1, length(text) // 2)
                 || '~' || substr(text, length(text) // 2 + 2) AS text
        FROM documents WHERE doc_id % 7 = 0
    ),
    {_DHASH8_CTE},
    pairs AS (
      -- band-COMBINATION candidates: >= 1 intact 2-band combo
      -- <=> >= 2 agreeing bands; radius 6 is pigeonhole-lossless at
      -- 8 bands / combo 2.
      SELECT a.media_id AS id_a, b.media_id AS id_b
      FROM h a JOIN h b
        ON a.media_id < b.media_id
       AND ({" + ".join(
               f"CASE WHEN a.b{q} = b.b{q} THEN 1 ELSE 0 END"
               for q in range(8)
           )}) >= 2
      WHERE ({" + ".join(
                f"bit_count(xor(a.b{q}, b.b{q}))" for q in range(8)
            )}) <= 6
    ), edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                 UNION SELECT id_b AS u, id_a AS v FROM pairs),
    walk(id, reach) AS (
        SELECT media_id, media_id FROM m
        UNION
        SELECT w.id, e.v FROM walk w JOIN edges e ON e.u = w.reach
    ),
    cc AS (SELECT id AS media_id, min(reach) AS cluster_id
           FROM walk GROUP BY id),
    csize AS (SELECT cluster_id, count(*) AS cluster_size
              FROM cc GROUP BY cluster_id)
    SELECT cc.media_id, CAST(cc.cluster_id AS BIGINT) AS cluster_id,
           CAST(csize.cluster_size AS BIGINT) AS cluster_size,
           cc.media_id = cc.cluster_id AS is_kept
    FROM cc JOIN csize USING (cluster_id)
    """,
)
def mm_near_dedup_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup at the WIDE fingerprint (round 14, the
    birthday-term fix the 4-band SCALE row names): 128-bit dHash
    (`fake_dhash_image_wide`, 8 bands) with the band-COMBINATION join
    (`near_dup_media_by_dhash_combo`, combo=2 — Manku's simhash block
    trick): candidates must agree on a whole 2-band combination, so
    bucket keys are 32 bits wide and uniform occupancy drops 2^16x vs
    the single-band join, while radius <= 6 stays pigeonhole-LOSSLESS
    (vs 3 at 4x16). Same planted fixture as `mm_near_dedup` (every 7th
    payload re-uploaded with one middle byte swapped) and the same
    keeper contract: the one-byte perturbation lands within radius 6
    of the wider hash, so every re-upload must rejoin its original.
    The oracle replays the 136-sample grid hash, the >=2-agreeing-bands
    candidate rule (exactly the union of combo joins), the radius, and
    the components."""
    from usgs_lidar_spark.multimodal import (
        fake_dhash_image_wide,
        near_dup_media_by_dhash_combo,
        to_media_table,
    )
    from usgs_lidar_spark.operators.graph import collapse_clusters

    d = _t(spark, sf_dir, "documents")
    n = F.length("text")
    reup = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, F.floor(n / 2).cast("int")),
            F.lit("~"),
            F.expr(
                "substring(text, CAST(length(text) / 2 AS INT) + 2)"
            ),
        ).alias("text"),
    )
    media = to_media_table(
        d.select("doc_id", "text").unionByName(reup), "doc_id", "text"
    )
    hashes = fake_dhash_image_wide(media, n_bands=8)
    pairs = near_dup_media_by_dhash_combo(
        hashes, max_hamming=6, n_bands=8, combo=2
    )
    return collapse_clusters(
        media.select(F.col("media_id")), pairs,
        id_col="media_id", pair_a="id_a", pair_b="id_b",
    )


def _audio_band_sql(q: int) -> str:
    """DuckDB expression for audio-energy band ``q``: 64 adjacent
    comparisons over the 65-block energy list — the exact packing of
    multimodal/binary_ops.audio_energy_fingerprint."""
    return f"""CAST(list_sum(list_transform(range(0, 16), j ->
        CASE WHEN en[CAST(16*{q}+j+1 AS INTEGER)]
                > en[CAST(16*{q}+j+2 AS INTEGER)]
             THEN (1 << CAST(j AS INTEGER)) ELSE 0 END)) AS BIGINT)"""


@query(
    "mm_audio_near_dedup",
    oracle=f"""
    WITH RECURSIVE m AS (
        SELECT doc_id AS media_id, text FROM documents
        UNION ALL
        -- near re-uploads: every 11th payload reappears with ONE middle
        -- sample changed — exact content dedup misses it; the energy
        -- profile moves by <= 2 comparison bits.
        SELECT doc_id + 100000 AS media_id,
               substr(text, 1, length(text) // 2)
                 || '~' || substr(text, length(text) // 2 + 2) AS text
        FROM documents WHERE doc_id % 11 = 0
    ), e AS (
      SELECT media_id, length(text) AS n,
             CASE WHEN length(text) < 65 THEN NULL ELSE
               list_transform(range(0, 65), k ->
                 list_sum(list_transform(
                   list_transform(
                     range(CAST(k * length(text) // 65 AS INTEGER),
                           CAST((k+1) * length(text) // 65 AS INTEGER)),
                     p -> CAST(ord(substr(text, CAST(p AS INTEGER) + 1, 1))
                               AS BIGINT) - 128),
                   x -> x * x)))
             END AS en
      FROM m
    ), h AS (
      SELECT media_id,
             CASE WHEN en IS NULL THEN NULL ELSE {_audio_band_sql(0)} END
                 AS b0,
             CASE WHEN en IS NULL THEN NULL ELSE {_audio_band_sql(1)} END
                 AS b1,
             CASE WHEN en IS NULL THEN NULL ELSE {_audio_band_sql(2)} END
                 AS b2,
             CASE WHEN en IS NULL THEN NULL ELSE {_audio_band_sql(3)} END
                 AS b3
      FROM e
    ), pairs AS (
      -- NULL bands match nothing (equality-with-NULL), so too-short
      -- payloads never pair — mirrored exactly by the Spark join.
      SELECT a.media_id AS id_a, b.media_id AS id_b
      FROM h a JOIN h b
        ON a.media_id < b.media_id
       AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
      WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
          + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
    ), edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                 UNION SELECT id_b AS u, id_a AS v FROM pairs),
    walk(id, reach) AS (
        SELECT media_id, media_id FROM m
        UNION
        SELECT w.id, e2.v FROM walk w JOIN edges e2 ON e2.u = w.reach
    ),
    cc AS (SELECT id AS media_id, min(reach) AS cluster_id
           FROM walk GROUP BY id),
    csize AS (SELECT cluster_id, count(*) AS cluster_size
              FROM cc GROUP BY cluster_id)
    SELECT cc.media_id, CAST(cc.cluster_id AS BIGINT) AS cluster_id,
           CAST(csize.cluster_size AS BIGINT) AS cluster_size,
           cc.media_id = cc.cluster_id AS is_kept
    FROM cc JOIN csize USING (cluster_id)
    """,
)
def mm_audio_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual AUDIO near-dup (round 14 — completes the modality
    matrix: text, embeddings, image, now audio): energy-profile
    difference hash (`audio_energy_fingerprint` — 65 length-normalized
    blocks, int64-exact sumsq energies, 64 adjacent comparisons as
    four 16-bit bands) into the SAME modality-agnostic banded join and
    CC keeper as the image tier. Fixture: documents' bytes as u8 PCM
    plus every 11th payload re-uploaded with one middle sample changed
    — at sf0.01, 44 of 46 re-uploads must rejoin their originals and
    the 2 too-short ones (< 65 samples → NULL bands) must stay
    SINGLETONS, never pair (546 rows, 502 keepers, zero spurious
    clusters — the fixed-window design this replaced jammed 255
    unrelated docs, see the operator docstring). The oracle replays
    blocks, energies, packing, NULL-band exclusion, banding, radius,
    and components exactly."""
    from usgs_lidar_spark.multimodal import (
        audio_energy_fingerprint,
        near_dup_media_by_dhash,
        to_media_table,
    )
    from usgs_lidar_spark.operators.graph import collapse_clusters

    d = _t(spark, sf_dir, "documents")
    n = F.length("text")
    reup = d.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, F.floor(n / 2).cast("int")),
            F.lit("~"),
            F.expr(
                "substring(text, CAST(length(text) / 2 AS INT) + 2)"
            ),
        ).alias("text"),
    )
    media = to_media_table(
        d.select("doc_id", "text").unionByName(reup), "doc_id", "text"
    )
    hashes = audio_energy_fingerprint(media)
    pairs = near_dup_media_by_dhash(hashes, max_hamming=3)
    return collapse_clusters(
        media.select(F.col("media_id")), pairs,
        id_col="media_id", pair_a="id_a", pair_b="id_b",
    )


@query(
    "mm_video_near_dedup",
    oracle="""
    WITH RECURSIVE m AS (
        SELECT doc_id AS media_id, text FROM documents
        UNION ALL
        -- trimmed re-uploads: every 13th video reappears minus its
        -- first 32-byte frame — byte-level md5 misses it, the frame
        -- SET is near-identical (containment 1.0 on survivors).
        SELECT doc_id + 100000 AS media_id, substr(text, 33) AS text
        FROM documents WHERE doc_id % 13 = 0
    ), fr AS (
        SELECT media_id,
               md5(substr(text, CAST(i * 32 + 1 AS INTEGER), 32)) AS digest
        FROM m, LATERAL (SELECT unnest(range(0, length(text) // 32)) AS i) s
    ), sigs AS (SELECT DISTINCT media_id, digest FROM fr),
    ok_digests AS (
        SELECT digest FROM sigs GROUP BY digest HAVING count(*) <= 20
    ), capped AS (
        SELECT s.media_id, s.digest
        FROM sigs s JOIN ok_digests USING (digest)
    ), counts AS (
        SELECT media_id, CAST(count(*) AS BIGINT) AS n_sigs
        FROM capped GROUP BY media_id
    ), shared AS (
        SELECT a.media_id AS id_a, b.media_id AS id_b,
               CAST(count(*) AS BIGINT) AS shared_frames
        FROM capped a JOIN capped b
          ON a.digest = b.digest AND a.media_id < b.media_id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT s.id_a, s.id_b
        FROM shared s
        JOIN counts ca ON ca.media_id = s.id_a
        JOIN counts cb ON cb.media_id = s.id_b
        WHERE CAST(s.shared_frames AS DOUBLE)
              / least(ca.n_sigs, cb.n_sigs) >= 0.9
    ), edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                 UNION SELECT id_b AS u, id_a AS v FROM pairs),
    walk(id, reach) AS (
        SELECT media_id, media_id FROM m
        UNION
        SELECT w.id, e.v FROM walk w JOIN edges e ON e.u = w.reach
    ),
    cc AS (SELECT id AS media_id, min(reach) AS cluster_id
           FROM walk GROUP BY id),
    csize AS (SELECT cluster_id, count(*) AS cluster_size
              FROM cc GROUP BY cluster_id)
    SELECT cc.media_id, CAST(cc.cluster_id AS BIGINT) AS cluster_id,
           CAST(csize.cluster_size AS BIGINT) AS cluster_size,
           cc.media_id = cc.cluster_id AS is_kept
    FROM cc JOIN csize USING (cluster_id)
    """,
)
def mm_video_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual VIDEO near-dup (round 14 — the last modality:
    frame-SET containment via `near_dup_video_by_frames` over
    `sample_frames`, the content-ID shape): payloads split into 32-byte
    raw frames, distinct per-frame md5 digests, videos paired through
    shared digests (df-capped at 20 — the stop-frame hot-key guard)
    with containment = shared / least(n_a, n_b) >= 0.9, then the
    shared CC keeper. Fixture: documents' bytes as frame buffers plus
    every 13th payload re-uploaded TRIMMED by its first frame — exact
    content dedup misses every one; here 36 of 39 must rejoin their
    originals (the 3 with under two complete frames stay singletons —
    the too-short convention), and 24 original pairs differing only in
    the dropped partial tail frame merge because their complete-frame
    sets are IDENTICAL — genuinely the same video under this
    definition, mirrored by the oracle. Only (id, digest) rows
    shuffle; frame bytes never leave their scan stage."""
    from usgs_lidar_spark.multimodal import (
        near_dup_video_by_frames,
        to_media_table,
    )
    from usgs_lidar_spark.operators.graph import collapse_clusters

    d = _t(spark, sf_dir, "documents")
    reup = d.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substring(text, 33)").alias("text"),
    )
    media = to_media_table(
        d.select("doc_id", "text").unionByName(reup), "doc_id", "text"
    )
    pairs = near_dup_video_by_frames(
        media, frame_size=32, min_containment=0.9, max_df=20
    )
    return collapse_clusters(
        media.select(F.col("media_id")), pairs,
        id_col="media_id", pair_a="id_a", pair_b="id_b",
    )


@query(
    "mm_near_dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE m AS (
        -- the corpus arrives DAMAGED for every 7th item (one '~'
        -- artifact mid-payload); the clean version is re-uploaded
        -- LATER under a higher id — min-id dedup keeps the damaged
        -- copy, quality-aware dedup must keep the clean one.
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 7 = 0 THEN
                   substr(text, 1, length(text) // 2) || '~'
                     || substr(text, length(text) // 2 + 2)
               ELSE text END AS text
        FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS media_id, text
        FROM documents WHERE doc_id % 7 = 0
    ),
    {_DHASH_CTE},
    pairs AS (
      SELECT a.media_id AS id_a, b.media_id AS id_b
      FROM h a JOIN h b
        ON a.media_id < b.media_id
       AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
      WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
          + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
    ), edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                 UNION SELECT id_b AS u, id_a AS v FROM pairs),
    walk(id, reach) AS (
        SELECT media_id, media_id FROM m
        UNION
        SELECT w.id, e.v FROM walk w JOIN edges e ON e.u = w.reach
    ),
    cc AS (SELECT id AS media_id, min(reach) AS cluster_id
           FROM walk GROUP BY id),
    scored AS (
        SELECT cc.media_id, cc.cluster_id,
               -(length(m.text) - length(replace(m.text, '~', '')))
                   AS quality
        FROM cc JOIN m USING (media_id)
    ),
    keepers AS (
        SELECT cluster_id,
               first(media_id ORDER BY quality DESC, media_id)
                   AS keeper_id,
               CAST(count(*) AS BIGINT) AS cluster_size
        FROM scored GROUP BY cluster_id
    )
    SELECT s.media_id, CAST(s.cluster_id AS BIGINT) AS cluster_id,
           k.cluster_size, k.keeper_id,
           s.media_id = k.keeper_id AS is_kept
    FROM scored s JOIN keepers k USING (cluster_id)
    """,
)
def mm_near_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-AWARE perceptual media dedup (round 14 — the curation
    rule real media pipelines use: keep the best copy, not the
    first-crawled): same dHash -> banded pairs -> components path as
    `mm_near_dedup`, but the keeper is `collapse_clusters_keep_best`'s
    argmax over an artifact score (quality = minus the payload's '~'
    artifact count — any per-item signal plugs in: resolution, bitrate,
    a classifier). The fixture makes the min-id rule demonstrably
    WRONG: every 7th item arrives damaged and its clean version is
    re-uploaded later under a HIGHER id, so at sf0.01 all 72 clean
    re-uploads must win their cluster elections over their lower-id
    damaged originals (572 rows, 500 keepers). The keeper is a
    struct-max fold, never a per-cluster window sort; the oracle
    replays hash, banding, components, scoring, and the
    (quality DESC, id) election."""
    from usgs_lidar_spark.multimodal import (
        fake_dhash_image,
        near_dup_media_by_dhash,
        to_media_table,
    )
    from usgs_lidar_spark.operators.graph import collapse_clusters_keep_best

    d = _t(spark, sf_dir, "documents")
    n = F.length("text")
    damaged = F.concat(
        F.substring("text", 1, F.floor(n / 2).cast("int")),
        F.lit("~"),
        F.expr("substring(text, CAST(length(text) / 2 AS INT) + 2)"),
    )
    base = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, damaged)
        .otherwise(F.col("text"))
        .alias("text"),
    )
    reup = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    media = to_media_table(base.unionByName(reup), "doc_id", "text")
    scored = media.select(
        "media_id",
        (
            -(
                F.length(F.decode("content", "UTF-8"))
                - F.length(
                    F.replace(
                        F.decode("content", "UTF-8"), F.lit("~"), F.lit("")
                    )
                )
            ).cast("long")
        ).alias("quality"),
    )
    pairs = near_dup_media_by_dhash(
        fake_dhash_image(media), max_hamming=3
    )
    return collapse_clusters_keep_best(
        scored, pairs, score_col="quality",
        id_col="media_id", pair_a="id_a", pair_b="id_b",
    )


@query(
    "mm_near_dedup_semantic",
    oracle=f"""
    WITH RECURSIVE m AS (
        SELECT doc_id AS media_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS media_id,
               substr(text, 1, length(text) // 2)
                 || '~' || substr(text, length(text) // 2 + 2) AS text
        FROM documents WHERE doc_id % 7 = 0
    ),
    {_DHASH_CTE},
    pairs AS (
      SELECT a.media_id AS id_a, b.media_id AS id_b
      FROM h a JOIN h b
        ON a.media_id < b.media_id
       AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
      WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
          + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
    ),
    -- embedding assignment: originals carry their own vector; every
    -- third re-upload ((doc % 21 = 0) of the doc % 7 = 0 slice) carries
    -- a DIFFERENT document's vector — dHash-close but semantically
    -- distinct, the false-merge the verify tier must reject.
    emap AS (
      SELECT media_id,
             CASE WHEN media_id >= 100000 THEN
                 CASE WHEN (media_id - 100000) % 21 = 0
                      THEN media_id - 100000 + 3
                      ELSE media_id - 100000 END
             ELSE media_id END AS eid
      FROM m
    ),
    verified AS (
      SELECT c.id_a, c.id_b
      FROM pairs c
      JOIN emap xa ON xa.media_id = c.id_a
      JOIN embeddings ea ON ea.vec_id = xa.eid
      JOIN emap xb ON xb.media_id = c.id_b
      JOIN embeddings eb ON eb.vec_id = xb.eid
      WHERE ROUND(
          list_sum(list_transform(list_zip(ea.embedding, eb.embedding),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(ea.embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(eb.embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) >= 0.9
    ),
    edges AS (SELECT id_a AS u, id_b AS v FROM verified
              UNION SELECT id_b AS u, id_a AS v FROM verified),
    walk(id, reach) AS (
        SELECT media_id, media_id FROM m
        UNION
        SELECT w.id, e.v FROM walk w JOIN edges e ON e.u = w.reach
    ),
    cc AS (SELECT id AS media_id, min(reach) AS cluster_id
           FROM walk GROUP BY id),
    csize AS (SELECT cluster_id, count(*) AS cluster_size
              FROM cc GROUP BY cluster_id)
    SELECT cc.media_id, CAST(cc.cluster_id AS BIGINT) AS cluster_id,
           CAST(csize.cluster_size AS BIGINT) AS cluster_size,
           cc.media_id = cc.cluster_id AS is_kept
    FROM cc JOIN csize USING (cluster_id)
    """,
)
def mm_near_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-TIER perceptual + semantic media dedup (round 15 — the
    production image-dedup shape: candidates cheap, verify exact):
    `fake_dhash_image` -> `near_dup_media_by_dhash` supplies RECALL
    (banded Hamming candidates, never all-pairs), then
    `multimodal.semantic_verify_pairs` supplies PRECISION — each
    candidate pair joins both endpoints to the `embeddings` table and
    survives only when the rounded cosine clears 0.9; only the verified
    pairs reach connected components. The fixture plants the exact
    failure the verify exists for: every third re-upload is dHash-close
    to its original (one perturbed byte) but carries a DIFFERENT
    document's embedding — perceptual-only dedup (`mm_near_dedup`)
    merges it; here it must stay a singleton. At sf0.01: 72 candidate
    re-upload pairs, 48 verified (identity embeddings, cosine 1.0), 24
    rejected (shifted embeddings, cosine <= 0.37 measured). Items
    without an embedding row drop their pairs (strict verify — no
    evidence, no merge), which also makes the query live at sf0.1 where
    embeddings cover only a vec_id prefix of documents. Scale: pairs
    are banded output, the verify joins shuffle (pair ids x vectors),
    CC moves labels; payloads and the corpus never re-shuffle."""
    from usgs_lidar_spark.multimodal import (
        fake_dhash_image,
        near_dup_media_by_dhash,
        semantic_verify_pairs,
        to_media_table,
    )
    from usgs_lidar_spark.operators.graph import collapse_clusters

    d = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    n = F.length("text")
    reup = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, F.floor(n / 2).cast("int")),
            F.lit("~"),
            F.expr(
                "substring(text, CAST(length(text) / 2 AS INT) + 2)"
            ),
        ).alias("text"),
    )
    media = to_media_table(
        d.select("doc_id", "text").unionByName(reup), "doc_id", "text"
    )
    doc0 = F.col("media_id") - 100000
    eid = F.when(
        F.col("media_id") >= 100000,
        F.when(doc0 % 21 == 0, doc0 + 3).otherwise(doc0),
    ).otherwise(F.col("media_id"))
    media_emb = (
        media.select("media_id", eid.alias("__eid"))
        .join(
            emb.select(
                F.col("vec_id").alias("__eid"), "embedding"
            ),
            "__eid",
        )
        .select("media_id", "embedding")
    )
    cand = near_dup_media_by_dhash(fake_dhash_image(media), max_hamming=3)
    verified = semantic_verify_pairs(
        cand, media_emb, threshold=0.9, id_col="media_id"
    )
    return collapse_clusters(
        media.select("media_id"), verified,
        id_col="media_id", pair_a="id_a", pair_b="id_b",
    )


@query(
    "mm_image_text_gate",
    oracle="""
    WITH base AS (
      SELECT vec_id AS pair_id, embedding AS cap,
             CASE WHEN vec_id % 3 = 0 THEN vec_id + 7 ELSE vec_id END
                 AS img_eid
      FROM embeddings
    ), pairs AS (
      SELECT b.pair_id, b.cap, i.embedding AS img
      FROM base b JOIN embeddings i ON i.vec_id = b.img_eid
    ), scored AS (
      SELECT pair_id,
             ROUND(
               list_sum(list_transform(list_zip(cap, img),
                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(cap,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(img,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)
                 AS clip_score
      FROM pairs
    )
    SELECT pair_id, clip_score, clip_score >= 0.9 AS kept FROM scored
    """,
)
def mm_image_text_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-text PAIR gating, LAION shape (round 15 —
    `multimodal.image_text_gate`): keep/drop paired (caption embedding,
    image embedding) rows by rounded cosine against a threshold, with
    the AUDIT output (score, kept) every curation gate in this engine
    emits — the multimodal counterpart of the text quality gate. The
    fixture pairs every embedding with ITSELF as the image side
    (aligned pairs, cosine 1.0) except every third vec_id, which is
    paired with a DIFFERENT document's vector (vec_id + 7 — the
    misaligned crawl pair the gate exists to drop; measured cross
    cosine <= 0.39 at both sf, so threshold 0.9 separates cleanly and
    no rounded value sits near the boundary). Map-only after one
    equi-join that exists only to BUILD the fixture's pairs — the gate
    itself adds no shuffle and fuses into the scan projection, the
    100 TB posture for a per-row filter. Misaligned ids whose +7
    partner is past the table edge drop at the build join in both
    engines."""
    from usgs_lidar_spark.multimodal import image_text_gate

    emb = _t(spark, sf_dir, "embeddings")
    img_eid = F.when(
        F.col("vec_id") % 3 == 0, F.col("vec_id") + 7
    ).otherwise(F.col("vec_id"))
    base = emb.select(
        F.col("vec_id").alias("pair_id"),
        F.col("embedding").alias("caption_embedding"),
        img_eid.alias("__img_eid"),
    )
    pairs = base.join(
        emb.select(
            F.col("vec_id").alias("__img_eid"),
            F.col("embedding").alias("image_embedding"),
        ),
        "__img_eid",
    )
    return image_text_gate(pairs, threshold=0.9).select(
        "pair_id", "clip_score", "kept"
    )


@query(
    "mm_hamming_sweep",
    oracle=f"""
    WITH RECURSIVE m AS (
        SELECT doc_id AS media_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS media_id,
               substr(text, 1, length(text) // 2)
                 || '~' || substr(text, length(text) // 2 + 2) AS text
        FROM documents WHERE doc_id % 7 = 0
    ),
    {_DHASH_CTE},
    pairs AS (
      SELECT a.media_id AS id_a, b.media_id AS id_b,
             bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
           + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
               AS hamming
      FROM h a JOIN h b
        ON a.media_id < b.media_id
       AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
      WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
          + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
    ),
    radii AS (SELECT * FROM range(0, 4) t(radius))
    SELECT r.radius, CAST(count(p.hamming) AS BIGINT) AS n_pairs
    FROM radii r LEFT JOIN pairs p ON p.hamming <= r.radius
    GROUP BY r.radius
    """,
)
def mm_hamming_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-tuning AUDIT for the perceptual near-dup tier: candidate
    pair counts at every Hamming radius 0..3 from ONE banded pair pass
    (the 4x16 banding is pigeonhole-lossless through radius 3, so the
    radius-3 pair set contains every smaller radius's pairs exactly —
    one scan, four curve points). This is the knob-tuning pass a
    curation operator runs BEFORE committing a dedup radius: how many
    merges each radius buys. Map-only hash + the standard banded join;
    the sweep itself is a 4-row conditional aggregate riding the pair
    frame — no per-radius re-clustering, no payload movement."""
    from usgs_lidar_spark.multimodal import (
        fake_dhash_image,
        near_dup_media_by_dhash,
        to_media_table,
    )

    d = _t(spark, sf_dir, "documents")
    n = F.length("text")
    reup = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, F.floor(n / 2).cast("int")),
            F.lit("~"),
            F.expr(
                "substring(text, CAST(length(text) / 2 AS INT) + 2)"
            ),
        ).alias("text"),
    )
    media = to_media_table(
        d.select("doc_id", "text").unionByName(reup), "doc_id", "text"
    )
    pairs = near_dup_media_by_dhash(
        fake_dhash_image(media), max_hamming=3
    ).localCheckpoint(eager=False)  # four radius consumers, one pass
    radii = spark.range(0, 4).select(F.col("id").cast("int").alias("radius"))
    return (
        radii.join(
            pairs, pairs["hamming"] <= radii["radius"], "left"
        )
        .groupBy("radius")
        .agg(F.count(pairs["hamming"]).cast("long").alias("n_pairs"))
    )


@query(
    "mm_shard_bytes",
    oracle=f"""
    WITH m AS (
      SELECT doc_id AS media_id, text,
             CAST(strlen(text) AS BIGINT) AS n_bytes,
             {_LEHMER_STREAM("doc_id", 4)} AS pack_stream
      FROM documents
    ),
    packed AS (
      SELECT media_id, text, pack_stream, n_bytes,
             CAST(sum(n_bytes) OVER w - n_bytes AS BIGINT) AS byte_start
      FROM m
      WINDOW w AS (PARTITION BY pack_stream ORDER BY media_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    spans AS (
      SELECT pack_stream, byte_start, n_bytes, text,
             unnest(generate_series(
                 CAST(floor(byte_start / 2048.0) AS BIGINT),
                 CAST(floor((byte_start + n_bytes - 1) / 2048.0) AS BIGINT)))
                 AS shard_id
      FROM packed WHERE n_bytes > 0
    ),
    pieces AS (
      SELECT pack_stream, shard_id, byte_start,
             substr(text,
                    CAST(greatest(0, shard_id * 2048 - byte_start)
                         AS BIGINT) + 1,
                    CAST(least(n_bytes, (shard_id + 1) * 2048 - byte_start)
                         - greatest(0, shard_id * 2048 - byte_start)
                         AS BIGINT)) AS piece
      FROM spans
    )
    SELECT CAST(pack_stream AS BIGINT) AS pack_stream, shard_id,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(strlen(piece)) AS BIGINT) AS shard_n_bytes,
           md5(string_agg(piece, '' ORDER BY byte_start)) AS shard_md5
    FROM pieces GROUP BY pack_stream, shard_id
    """,
)
def mm_shard_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard PAYLOAD materialization (round 16 — VERDICT r15 item 3,
    the byte mover the manifest writer was missing): pack the media
    corpus into 2048-byte shards over 4 Lehmer streams
    (`pack_sequences`), then run `multimodal.shard_payload_blobs` —
    the payload-to-assignment join, map-side boundary slicing, and
    per-(stream, shard) ordered binary assembly — and emit each shard's
    byte-layout digest (md5 of the assembled blob), item count, and
    size. The oracle replays the exact byte layout with VARCHAR slices
    (documents text is ASCII, so char offsets ARE byte offsets and
    DuckDB's md5(string) equals Spark's md5(binary) on identical
    bytes) — a shard boundary cut one byte off, an item out of order,
    or a lost split tail all flip the digest. Scale shape per the op's
    contract: payload bytes shuffle exactly once, slices cut map-side,
    per-shard assembly state bounded by the budget; the lazy over-
    budget raise_error guard rides the aggregation."""
    from usgs_lidar_spark.multimodal import (
        shard_payload_blobs,
        to_media_table,
    )
    from usgs_lidar_spark.operators.pipeline import pack_sequences

    media = to_media_table(
        _t(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
        "text",
    ).localCheckpoint(eager=False)  # two consumers: assignment + payloads
    packed = pack_sequences(
        media.select("media_id", "n_bytes"),
        "media_id",
        F.col("n_bytes"),
        budget=2048,
        n_streams=4,
    ).select(
        "media_id",
        F.col("pack_stream").cast("long").alias("pack_stream"),
        F.col("token_start").alias("byte_start"),
        "n_bytes",
    )
    return shard_payload_blobs(
        packed, media.select("media_id", "content"), budget=2048
    ).select(
        "pack_stream",
        "shard_id",
        F.col("n_items").cast("long").alias("n_items"),
        "shard_n_bytes",
        F.md5("shard_bytes").alias("shard_md5"),
    )


@query(
    "dq_k_anonymity",
    oracle="""
    WITH tot AS (SELECT count(*) AS total FROM documents),
    g AS (
        SELECT d.doc_id, d.lang, d.source,
               CAST(count(*) OVER (PARTITION BY d.lang, d.source)
                    AS BIGINT) AS group_n,
               CAST(greatest(1, ceil(0.02 * t.total)) AS BIGINT) AS k
        FROM documents d CROSS JOIN tot t
    )
    SELECT doc_id,
           CASE WHEN group_n >= k THEN lang END AS lang,
           CASE WHEN group_n >= k THEN source END AS source,
           group_n,
           group_n < k AS suppressed
    FROM g
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity suppression of the (lang, source) quasi-identifier
    pair (round 16 — `operators/dq.suppress_rare_groups`): rows whose
    combination has fewer than k = ceil(2% of corpus) members get the
    pair NULLed before release — the combination-attack guard above
    `redact_pii`'s direct-identifier scrubbing. The fractional k is
    the scale-stable form (an absolute k silently loosens as the
    corpus grows); at sf0.01 it resolves to 10 against group sizes
    1-16 (mixed suppression), at sf0.1 to 100 against 24-112 — the
    threshold ENGAGES at every tested scale. One window shuffle, no
    join back, no collect."""
    from usgs_lidar_spark.operators.dq import suppress_rare_groups

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return suppress_rare_groups(
        d, ["lang", "source"], k_frac=0.02, mode="null"
    ).select("doc_id", "lang", "source", "group_n", "suppressed")
