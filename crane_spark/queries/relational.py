"""Relational query surface over the TPC-H-ish star schema
(SURVEY.md §2.2: projection/filter/scalar, aggregation, joins, windows,
sort/limit, set ops).

Scale notes baked into every builder:
* dimension joins take an explicit ``F.broadcast`` hint (region,
  nation, supplier, customer are small at any SF; the 100 TB fact
  tables never shuffle for them),
* aggregates route through DECIMAL casts (functions.aggregates) so the
  float results are shuffle-order independent,
* all filters are plain column predicates on scan columns → Catalyst
  pushes them into the parquet reader (verified in tests via
  ``PushedFilters`` in the formatted plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
from crane_spark.tables import fan_out, table

# --------------------------------------------------------------------
# TPC-H-shaped analytics
# --------------------------------------------------------------------

Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 2)} AS sum_qty,
       {sql_dsum('l_extendedprice', 2)} AS sum_base_price,
       {SQL_REVENUE_USUM} AS sum_disc_price,
       {sql_usum(f"{SQL_REVENUE_UNITS} * (100 + {sql_units('l_tax')})", 6)} AS sum_charge,
       {sql_dsum('l_quantity', 2)} / COUNT(*) AS avg_qty,
       {sql_dsum('l_extendedprice', 2)} / COUNT(*) AS avg_price,
       {sql_dsum('l_discount', 2)} / COUNT(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-06-30'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", Q1_SQL, tags=("agg", "tpch"))
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide multi-aggregate with group-by on two low-
    cardinality keys. Partial aggregation shrinks the shuffle to
    (#groups x #partitions) rows.

    The local testdata is one single-row-group file per table, so the
    scan-side partial agg would serialize on one core; fan_out spreads
    the (projected, filtered) rows first. At production scale the file
    splits already parallelize the scan and fan_out is a no-op."""
    li = table(spark, sf_dir, "lineitem")
    # Money products run in exact integer fixed-point units (see
    # aggregates.units): the double products rounded differently in
    # Spark vs DuckDB at the sf1 rung (adjacent-double sum_charge).
    charge_units = revenue_units() * (F.lit(100) + units("l_tax"))
    n = F.count(F.lit(1))
    needed = [
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax",
    ]
    return (
        fan_out(
            li.filter(
                F.col("l_shipdate") <= F.lit("2000-06-30").cast("timestamp")
            ).select(*needed)
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 2).alias("sum_qty"),
            dsum("l_extendedprice", 2).alias("sum_base_price"),
            revenue_usum().alias("sum_disc_price"),
            usum(charge_units, 6).alias("sum_charge"),
            (dsum("l_quantity", 2) / n).alias("avg_qty"),
            (dsum("l_extendedprice", 2) / n).alias("avg_price"),
            (dsum("l_discount", 2) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


Q3_SQL = f"""
SELECT l_orderkey,
       {SQL_REVENUE_USUM} AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", Q3_SQL, tags=("join", "agg", "topk", "tpch"))
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: dim-filter -> broadcast join -> fact join ->
    group -> top-k with a total-order tiebreaker (l_orderkey)."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue_usum().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q5_SQL = f"""
SELECT n_name,
       {SQL_REVENUE_USUM} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


@register("q5_local_supplier_volume", Q5_SQL, tags=("join", "agg", "tpch"))
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join. Every dimension broadcasts;
    the only shuffle left is the final small group-by."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(revenue_usum().alias("revenue"))
    )


Q6_SQL = f"""
SELECT {sql_usum(f"{sql_units('l_extendedprice')} * {sql_units('l_discount')}", 4)} AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
"""


@register("q6_revenue_forecast", Q6_SQL, tags=("agg", "filter", "tpch"))
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: selective scan + global aggregate. All four
    predicates push down to the parquet reader."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(
        usum(units("l_extendedprice") * units("l_discount"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------
# Dates / grouping variants
# --------------------------------------------------------------------

MONTHLY_SQL = f"""
SELECT date_trunc('month', o_orderdate) AS order_month,
       count(*) AS n_orders,
       {sql_dsum('o_totalprice', 2)} AS total_revenue
FROM orders
GROUP BY order_month
"""


@register("orders_monthly", MONTHLY_SQL, tags=("agg", "dates"))
def q_orders_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", 2).alias("total_revenue"),
        )
    )


DATE_PARTS_SQL = """
SELECT o_orderkey,
       EXTRACT(YEAR FROM o_orderdate) AS o_year,
       EXTRACT(QUARTER FROM o_orderdate) AS o_quarter,
       EXTRACT(MONTH FROM o_orderdate) AS o_month,
       EXTRACT(DAY FROM o_orderdate) AS o_day,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_start
FROM orders
"""


@register("date_parts", DATE_PARTS_SQL, tags=("dates", "projection"))
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).cast("long").alias("o_year"),
        F.quarter(d).cast("long").alias("o_quarter"),
        F.month(d).cast("long").alias("o_month"),
        F.dayofmonth(d).cast("long").alias("o_day"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp")).cast("long").alias(
            "days_since_start"
        ),
    )


ROLLUP_SQL = f"""
SELECT c_nationkey, c_mktsegment,
       count(*) AS n_customers,
       {sql_dsum('c_acctbal', 2)} AS acctbal_sum
FROM customer
GROUP BY ROLLUP (c_nationkey, c_mktsegment)
"""


@register("rollup_customer", ROLLUP_SQL, tags=("agg", "rollup"))
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    return cust.rollup("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal", 2).alias("acctbal_sum"),
    )


CUBE_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 2)} AS sum_qty,
       count(*) AS n_items
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("cube_returns", CUBE_SQL, tags=("agg", "cube"))
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality keys, with the fact table
    pre-aggregated per (flag, status) FIRST: Spark plans CUBE as an
    Expand that replicates every input row once per grouping set (4x
    the fact scan), so collapsing 600k rows to the ~4 distinct key
    combinations before the Expand multiplies ~4 rows instead —
    measured 2.2x. Decimal partials re-sum exactly, so the result is
    bit-identical; requires non-null group keys (TPC-H guarantees),
    else Expand's grouping nulls would collide with data nulls."""
    import pyspark.sql.types as T

    from crane_spark.functions.aggregates import PRECISION

    li = table(spark, sf_dir, "lineitem")
    pre = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(T.DecimalType(PRECISION, 2))).alias("ps"),
        F.count(F.lit(1)).alias("pn"),
    )
    return pre.cube("l_returnflag", "l_linestatus").agg(
        F.sum("ps").cast("double").alias("sum_qty"),
        F.sum("pn").alias("n_items"),
    )


DISTINCT_SQL = """
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
"""


@register("distinct_counts", DISTINCT_SQL, tags=("agg", "distinct"))
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --------------------------------------------------------------------
# Join variants
# --------------------------------------------------------------------

SEMI_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_totalprice > 100000
)
"""


@register("semi_join_big_spenders", SEMI_SQL, tags=("join", "semi"))
def q_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


ANTI_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_totalprice > 100000
)
"""


@register("anti_join_small_spenders", ANTI_SQL, tags=("join", "anti"))
def q_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


RANGE_JOIN_SQL = f"""
SELECT bucket, count(*) AS n_orders, {sql_dsum('o_totalprice', 2)} AS revenue
FROM orders
JOIN (VALUES ('small', CAST(0 AS DOUBLE), CAST(100000 AS DOUBLE)),
             ('medium', CAST(100000 AS DOUBLE), CAST(250000 AS DOUBLE)),
             ('large', CAST(250000 AS DOUBLE), CAST(1e12 AS DOUBLE))) AS b(bucket, lo, hi)
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY bucket
"""


@register("range_join_buckets", RANGE_JOIN_SQL, tags=("join", "range"))
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join: fact rows land in value-range buckets via
    a broadcast nested-loop join against a tiny bounds table."""
    orders = fan_out(table(spark, sf_dir, "orders"))
    # VALUES (a LocalTableScan) rather than createDataFrame (an
    # ExistingRDD): the broadcast side must not drag a Python-RDD
    # evaluation stage into every execution.
    buckets = spark.sql(
        "SELECT * FROM VALUES "
        "('small',  CAST(0        AS DOUBLE), CAST(100000 AS DOUBLE)), "
        "('medium', CAST(100000   AS DOUBLE), CAST(250000 AS DOUBLE)), "
        "('large',  CAST(250000   AS DOUBLE), CAST(1e12   AS DOUBLE)) "
        "AS t(bucket, lo, hi)"
    )
    cond = (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi"))
    return (
        orders.join(F.broadcast(buckets), cond)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", 2).alias("revenue"))
    )


# --------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------

UNION_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
"""


@register("union_nations", UNION_SQL, tags=("setop",))
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.union(supp).distinct()


EXCEPT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey FROM supplier
"""


@register("except_nations", EXCEPT_SQL, tags=("setop",))
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.subtract(supp)


INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
"""


@register("intersect_nations", INTERSECT_SQL, tags=("setop",))
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


# --------------------------------------------------------------------
# Windows / sort / top-k
# --------------------------------------------------------------------

TOP_CUST_SQL = """
SELECT c_nationkey, c_custkey, c_name, c_acctbal, rn
FROM (
  SELECT c_nationkey, c_custkey, c_name, c_acctbal,
         CAST(row_number() OVER (
           PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
         ) AS BIGINT) AS rn
  FROM customer
)
WHERE rn <= 3
"""


@register("top_customers_per_nation", TOP_CUST_SQL, tags=("window", "topk"))
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_name", "c_acctbal", "rn")
    )


RUNNING_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_total,
       lag(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS prev_price
FROM orders
"""


@register("window_running_total", RUNNING_SQL, tags=("window",))
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    order_w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    running = (
        F.sum(F.col("o_totalprice").cast("decimal(28,2)")).over(frame_w).cast("double")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        running.alias("running_total"),
        F.lag("o_totalprice").over(order_w).alias("prev_price"),
    )


TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register("topk_orders", TOPK_SQL, tags=("sort", "topk"))
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heaps + one k-row merge, no full sort at scale."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


# --------------------------------------------------------------------
# Scalar expression coverage
# --------------------------------------------------------------------

CASE_SQL = f"""
SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
            WHEN o_totalprice < 250000 THEN 'medium'
            ELSE 'large' END AS bucket,
       count(*) AS n_orders,
       {sql_dsum('o_totalprice', 2)} AS revenue
FROM orders
GROUP BY bucket
"""


@register("case_price_buckets", CASE_SQL, tags=("conditional", "agg"))
def q_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 250000, "medium")
        .otherwise("large")
    )
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", 2).alias("revenue"))
    )


STRING_SQL = """
SELECT p_partkey,
       upper(p_brand) AS brand_u,
       CAST(length(p_name) AS BIGINT) AS name_len,
       p_brand || '-' || p_type AS brand_type,
       substring(p_name, 1, 8) AS name_pfx,
       replace(p_name, ' ', '_') AS name_us
FROM part
WHERE p_name LIKE '%a%'
"""


@register("string_funcs", STRING_SQL, tags=("strings", "projection"))
def q_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    return part.filter(F.col("p_name").like("%a%")).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("brand_type"),
        F.substring("p_name", 1, 8).alias("name_pfx"),
        F.regexp_replace("p_name", " ", "_").alias("name_us"),
    )


MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       abs(l_extendedprice - 50000) AS abs_diff,
       CAST(floor(l_quantity / 7) AS BIGINT) AS qty_div7,
       CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_ceil7,
       sqrt(l_quantity) AS qty_sqrt,
       power(l_quantity, 2) AS qty_sq,
       round(ln(l_quantity + 1), 6) AS qty_ln,
       l_orderkey % 7 AS key_mod7
FROM lineitem
WHERE l_linenumber = 1
"""


@register("math_funcs", MATH_SQL, tags=("math", "projection"))
def q_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000).alias("abs_diff"),
        F.floor(q / 7).alias("qty_div7"),
        F.ceil(q / 7).alias("qty_ceil7"),
        F.sqrt(q).alias("qty_sqrt"),
        F.pow(q, 2).alias("qty_sq"),
        F.round(F.log(q + 1), 6).alias("qty_ln"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


COALESCE_SQL = """
SELECT coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg,
       count(*) AS n
FROM customer
GROUP BY seg
"""


@register("coalesce_nullif", COALESCE_SQL, tags=("conditional",))
def q_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    seg = F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("(none)"))
    return cust.groupBy(seg.alias("seg")).agg(F.count(F.lit(1)).alias("n"))
