"""Additional TPC-H-shaped queries adapted to the synthetic schema:
nation-pair trade volume (Q7), returned-item reporting (Q10), promo
revenue share (Q14), OR-of-ANDs predicate blocks (Q19), plus range-
frame windows and edit-distance fuzzy matching."""

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
    sql_usum,
    usum,
)
from crane_spark.queries.core import register
from crane_spark.tables import table

Q7_SQL = f"""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       EXTRACT(YEAR FROM l_shipdate) AS l_year,
       {SQL_REVENUE_USUM} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name IN ('NATION_3', 'NATION_4')
GROUP BY cust_nation, supp_nation, l_year
"""


@register("q7_nation_volume", Q7_SQL, tags=("join", "agg", "tpch"))
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between nation pairs by year —
    the same dimension (nation) joined twice under different roles."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_3", "NATION_4"))
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
        .groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(revenue_usum().alias("revenue"))
    )


Q10_SQL = f"""
SELECT c_custkey, c_name,
       {SQL_REVENUE_USUM} AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", Q10_SQL, tags=("join", "agg", "topk", "tpch"))
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue ranking of customers who returned
    items in a window."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue_usum().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q14_SQL = f"""
SELECT CAST(100 AS DOUBLE)
       * {sql_usum("CASE WHEN p_type LIKE 'PROMO%' THEN " + SQL_REVENUE_UNITS + " ELSE 0 END", 4)}
       / {SQL_REVENUE_USUM} AS promo_share,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate <  TIMESTAMP '1997-04-01'
"""


@register("q14_promo_share", Q14_SQL, tags=("join", "agg", "tpch"))
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-revenue share (ratio of two exact
    decimal sums)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type").like("PROMO%"), revenue_units()).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (F.lit(100.0) * usum(promo, 4) / revenue_usum()).alias("promo_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q19_SQL = f"""
SELECT {SQL_REVENUE_USUM} AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


@register("q19_predicate_blocks", Q19_SQL, tags=("join", "filter", "tpch"))
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of conjunctive predicate blocks spanning
    both join sides (the optimizer must keep the join keys pushable
    while the residual OR evaluates post-join)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    blocks = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & q.between(10, 40))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & q.between(20, 50))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(blocks)
        .agg(revenue_usum().alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


RANGE_FRAME_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS day_no
  FROM orders
)
SELECT o_custkey, o_orderkey, day_no,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) OVER (
         PARTITION BY o_custkey ORDER BY day_no
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS total_7d,
       CAST(count(*) OVER (
         PARTITION BY o_custkey ORDER BY day_no
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_7d
FROM o
"""


@register("rolling_7day_range_frame", RANGE_FRAME_SQL, tags=("window", "range-frame"))
def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time (7-day rolling revenue per customer)
    — value-based framing, not row counting: ties on day_no all join
    the frame, gaps shrink it."""
    orders = table(spark, sf_dir, "orders")
    day_no = F.datediff(
        F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
    ).cast("long")
    o = orders.select("o_custkey", "o_orderkey", "o_totalprice", day_no.alias("day_no"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_no")
        .rangeBetween(-6, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "day_no",
        F.sum(F.col("o_totalprice").cast("decimal(28,2)")).over(w).cast("double").alias("total_7d"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_7d"),
    )


EDIT_DIST_SQL = """
WITH p AS (SELECT p_partkey, p_name FROM part WHERE p_partkey < 40)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
FROM p a JOIN p b ON a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 4
"""


@register("edit_distance_pairs", EDIT_DIST_SQL, tags=("llm", "dedup", "strings"))
def q_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance) matching over a bounded candidate set —
    the record-linkage flavor of near-dedup."""
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 40)
        .select("p_partkey", "p_name")
    )
    a = p.select(F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"))
    b = p.select(F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"))
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", dist.cast("long").alias("edit_dist"))
        .filter(F.col("edit_dist") <= 4)
    )
