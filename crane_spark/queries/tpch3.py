"""TPC-H decision-support shapes adapted to the synthetic schema
(no partsupp table, no commit/receipt dates — lateness is derived from
l_shipdate vs o_orderdate instead).

Covered here: Q4 (EXISTS), Q8 (market share ratio), Q9 (profit proxy),
Q12 (conditional priority counts), Q13 (customer order distribution
with zeros), Q15 (top supplier vs scalar max), Q17 (correlated avg
threshold), Q18 (IN over grouped HAVING), Q21 (EXISTS + NOT EXISTS
chain), Q22 (anti join + scalar avg threshold).

Scale notes: every dimension join is broadcast; EXISTS/NOT EXISTS
become left-semi / left-anti joins (no row explosion, map-side when
the probe side is broadcastable); all money sums route through
DECIMAL(28,s) (functions.aggregates) so results are shuffle-order
independent; top-k always carries a total-order tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crane_spark.functions.aggregates import (
    SQL_REVENUE_UNITS,
    SQL_REVENUE_USUM,
    dsum,
    revenue_units,
    revenue_usum,
    sql_dsum,
    sql_units,
    sql_usum,
    units,
    usum,
)
from crane_spark.queries.core import register
from crane_spark.tables import table

# Revenue sums run in exact integer fixed-point units (aggregates.
# units/usum): double products of nominally-2dp columns round
# differently in Spark vs DuckDB near decimal-grid boundaries
# (observed on Q1 sum_charge at the sf1 rung).


# --------------------------------------------------------------------
# Q4 — order priority checking (EXISTS -> left-semi join)
# --------------------------------------------------------------------

Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


@register("q4_order_priority", Q4_SQL, tags=("join", "semi", "agg", "tpch"))
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS over the fact table as a left-semi join
    with a non-equi residual (l_shipdate > o_orderdate)."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------
# Q8 — national market share (conditional-sum ratio)
# --------------------------------------------------------------------

Q8_SQL = f"""
SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
       {sql_usum("CASE WHEN sn.n_name = 'NATION_5' THEN " + SQL_REVENUE_UNITS + " ELSE 0 END", 4)}
         / {SQL_REVENUE_USUM} AS mkt_share
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region   ON cn.n_regionkey = r_regionkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY o_year
"""


@register("q8_market_share", Q8_SQL, tags=("join", "agg", "tpch"))
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 7-table star join, market share as a ratio of a
    conditional decimal sum over the total — all dims broadcast, the
    fact table shuffles once for the year group-by."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    nation_vol = F.when(
        F.col("supp_nation") == "NATION_5", revenue_units()
    ).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg((usum(nation_vol, 4) / revenue_usum()).alias("mkt_share"))
    )


# --------------------------------------------------------------------
# Q9 — product-type profit proxy (no partsupp: retail-price cost stand-in)
# --------------------------------------------------------------------

Q9_SQL = f"""
SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
       {sql_usum(f"{SQL_REVENUE_UNITS} * 10 - {sql_units('p_retailprice')} * {sql_units('l_quantity')}", 5)} AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
"""


@register("q9_profit_by_nation", Q9_SQL, tags=("join", "agg", "tpch"))
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year. The schema
    has no partsupp, so supply cost is proxied as 10% of retail price
    x quantity — the join/agg shape (4 joins into a two-key rollup) is
    what's under test."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    profit_units = revenue_units() * F.lit(10) - units("p_retailprice") * units(
        "l_quantity"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(usum(profit_units, 5).alias("sum_profit"))
    )


# --------------------------------------------------------------------
# Q12 — late-shipment priority counts (conditional aggregation)
# --------------------------------------------------------------------

Q12_SQL = """
SELECT l_linestatus,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS high_line_count,
       SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


@register("q12_late_priority", Q12_SQL, tags=("join", "agg", "tpch"))
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: count high/low-priority orders among late
    shipments (shipped >60 days after order) — conditional integer
    aggregation after a non-equi filtered fact-fact join."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------
# Q13 — customer order-count distribution (left outer keeps zeros)
# --------------------------------------------------------------------

Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


@register("q13_order_distribution", Q13_SQL, tags=("join", "outer", "agg", "tpch"))
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of orders-per-customer where
    customers with zero qualifying orders must appear (left outer +
    count of the nullable key, then a second aggregation)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# --------------------------------------------------------------------
# Q15 — top supplier (scalar max subquery on an aggregated view)
# --------------------------------------------------------------------

Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {SQL_REVENUE_USUM} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", Q15_SQL, tags=("join", "agg", "subquery", "tpch"))
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: suppliers whose quarterly revenue equals the
    maximum. The decimal-exact sums make the float equality safe on
    both engines; the scalar max is a broadcast single-row join."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        revenue_usum().alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        supp.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated per-part average)
# --------------------------------------------------------------------

_QTY_AVG = (
    "SELECT CAST(0.2 AS DOUBLE) * "
    "(CAST(SUM(CAST(l2.l_quantity AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*)) "
    "FROM lineitem l2 WHERE l2.l_partkey = p_partkey"
)

Q17_SQL = f"""
SELECT {sql_dsum('l_extendedprice', 2)} / CAST(7.0 AS DOUBLE) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < ({_QTY_AVG})
"""


@register("q17_small_quantity", Q17_SQL, tags=("join", "subquery", "agg", "tpch"))
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lines below 20% of their part's average
    quantity. The correlated scalar average de-correlates into a
    per-part aggregate joined back to the fact rows (exact decimal
    avg on both engines)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    li_b = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    avgs = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("avg_partkey"))
        .agg((dsum("l_quantity", 2) / F.count(F.lit(1))).alias("avg_qty"))
    )
    return (
        li_b.join(F.broadcast(avgs), F.col("l_partkey") == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg((dsum("l_extendedprice", 2) / F.lit(7.0)).alias("avg_yearly"))
    )


# --------------------------------------------------------------------
# Q18 — large-volume customers (IN over grouped HAVING)
# --------------------------------------------------------------------

Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {sql_dsum('l_quantity', 2)} AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING {sql_dsum('l_quantity', 2)} > 150
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register("q18_large_volume", Q18_SQL, tags=("join", "semi", "agg", "topk", "tpch"))
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a
    threshold. The textbook plan joins lineitem back after the
    IN-subquery and re-aggregates — but the HAVING subquery already
    computed each surviving order's total quantity, and the final
    grouping is one row per order, so the re-aggregation is subsumed:
    ONE lineitem scan, one shuffle, then an inner join with orders
    carries total_qty straight through. (The oracle runs the textbook
    double-scan form; both reduce to the same rows.)"""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


# --------------------------------------------------------------------
# Q21 — sole late supplier (EXISTS + NOT EXISTS chain)
# --------------------------------------------------------------------

Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND n_name IN ('NATION_0', 'NATION_1', 'NATION_2')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


@register("q21_sole_late_supplier", Q21_SQL, tags=("join", "semi", "anti", "tpch"))
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late supplier on a
    multi-supplier order. EXISTS -> left-semi, NOT EXISTS -> left-anti,
    both with non-equi residuals referencing the outer row."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    nation = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_0", "NATION_1", "NATION_2")
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    l1 = (
        li.join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(late)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_shipdate").alias("l3_shipdate"),
    )
    with_other = l1.join(
        l2,
        (F.col("l2_orderkey") == F.col("l_orderkey"))
        & (F.col("l2_suppkey") != F.col("l_suppkey")),
        "left_semi",
    )
    sole_late = with_other.join(
        l3,
        (F.col("l3_orderkey") == F.col("l_orderkey"))
        & (F.col("l3_suppkey") != F.col("l_suppkey"))
        & (F.col("l3_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_anti",
    )
    return (
        sole_late.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


# --------------------------------------------------------------------
# Q22 — dormant high-balance customers (scalar avg + NOT EXISTS)
# --------------------------------------------------------------------

Q22_SQL = f"""
WITH avg_bal AS (
  SELECT {sql_dsum('c_acctbal', 2)} / COUNT(*) AS ab
  FROM customer WHERE c_acctbal > CAST(0.0 AS DOUBLE)
)
SELECT c_nationkey AS cntry, count(*) AS numcust,
       {sql_dsum('c_acctbal', 2)} AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT ab FROM avg_bal)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


@register("q22_dormant_customers", Q22_SQL, tags=("anti", "subquery", "agg", "tpch"))
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balance and no
    urgent orders, grouped by nation (the synthetic data gives every
    customer at least one order, so "dormant" means no 1-URGENT).
    Scalar average broadcast as a one-row cross join; NOT EXISTS as a
    left-anti join on the orders key."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg((dsum("c_acctbal", 2) / F.count(F.lit(1))).alias("ab"))
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", 2).alias("totacctbal"),
        )
    )
