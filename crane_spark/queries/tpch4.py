"""The last four TPC-H shapes (Q2, Q11, Q16, Q20), completing all 22.

The synthetic schema has no partsupp table, so the part-supplier
relationship (and a supply-cost proxy) is DERIVED from lineitem:
cost(part, supplier) = min unit price ever charged. The query SHAPES
are the point — correlated scalar-min (Q2), HAVING against a global
scalar (Q11), count-distinct with a NOT-IN prune (Q16), and a nested
IN over a grouped HAVING (Q20) — and each maps to the Spark plan a
100 TB run wants: window-min instead of a per-row correlated rescan,
broadcast dimension semi/anti joins, map-side partial aggregation.

Reference lineage: the reference engine has no SQL surface at all
(three fixed topologies, crane_master.py:18); this module is part of
the declared SURVEY §2.2 relational surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crane_spark.queries.core import register
from crane_spark.tables import table


# --------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated scalar min -> window min)
# --------------------------------------------------------------------

Q2_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS supplycost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand, ps.supplycost
FROM ps
JOIN part p ON ps.l_partkey = p.p_partkey
JOIN supplier s ON ps.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE p.p_size = 15 AND p.p_type = 'SMALL' AND r.r_name = 'EUROPE'
  AND ps.supplycost = (
    SELECT MIN(ps2.supplycost)
    FROM ps ps2
    JOIN supplier s2 ON ps2.l_suppkey = s2.s_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
LIMIT 100
"""


@register("q2_min_cost_supplier", Q2_SQL, tags=("join", "subquery", "window", "topk", "tpch"))
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape. The correlated `= (SELECT MIN ...)` subquery is
    evaluated as a window MIN over the part key — one pass over the
    derived part-supplier table instead of a rescan per part. All four
    dimension joins broadcast; the only shuffles are the ps aggregation
    and the window partition."""
    li = table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    joined = (
        ps.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "supplycost")
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(100)
    )


# --------------------------------------------------------------------
# Q11 — important part values (HAVING vs a global scalar)
# --------------------------------------------------------------------

# Decimal-FIRST money arithmetic: price and discount are exact 2dp
# values stored as doubles, so casting each to DECIMAL(18,2) before the
# multiply recovers the intended cents exactly, and the scale-4 product
# sums exactly on both engines. (Computing in double and casting the
# PRODUCT to decimal can land on a .xx5 rounding midpoint that the two
# engines break differently — observed one cent of drift at sf0.01.)
_SQL_REV_DEC = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) "
    "* (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)

Q11_SQL = f"""
WITH scoped AS (
  SELECT l_partkey, {_SQL_REV_DEC} AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
)
SELECT l_partkey, CAST(SUM(rev) AS DOUBLE) AS part_value
FROM scoped
GROUP BY l_partkey
HAVING CAST(SUM(rev) AS DOUBLE) >
  (SELECT CAST(SUM(rev) AS DOUBLE) * CAST(0.001 AS DOUBLE) FROM scoped)
"""


def _rev_dec() -> F.Column:
    one = F.lit(1).cast("decimal(18,2)")
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        one - F.col("l_discount").cast("decimal(18,2)")
    )


@register("q11_important_parts", Q11_SQL, tags=("join", "agg", "subquery", "tpch"))
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value filtered against a fraction of
    the global total. The scalar total is a second aggregate over the
    same (small, broadcastable) scoped frame — at 100 TB both
    aggregations partial-combine map-side and the broadcast is one
    row."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    scoped = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_partkey", _rev_dec().alias("rev"))
    )
    per_part = scoped.groupBy("l_partkey").agg(
        F.sum("rev").cast("double").alias("part_value")
    )
    total = scoped.agg(
        (F.sum("rev").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return per_part.join(F.broadcast(total)).filter(
        F.col("part_value") > F.col("threshold")
    ).select("l_partkey", "part_value")


# --------------------------------------------------------------------
# Q16 — supplier count by part attribute (NOT IN prune + count-distinct)
# --------------------------------------------------------------------

Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'ECO%'
  AND p_size IN (5, 10, 15, 20, 25, 30)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@register("q16_supplier_cnt", Q16_SQL, tags=("join", "anti", "distinct", "agg", "tpch"))
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: the NOT IN becomes a broadcast left-anti join
    (keys are non-null, so anti == NOT IN), the part filter prunes
    before the join, and count(DISTINCT) runs as Catalyst's two-phase
    distinct-aggregate expansion."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("ECO%"))
        & (F.col("p_size").isin(5, 10, 15, 20, 25, 30))
    )
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# --------------------------------------------------------------------
# Q20 — promotion-part suppliers (nested IN over grouped HAVING)
# --------------------------------------------------------------------

Q20_SQL = """
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(l_quantity) > 50
  )
"""


@register("q20_promo_suppliers", Q20_SQL, tags=("join", "semi", "subquery", "agg", "tpch"))
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: innermost IN is a broadcast semi join onto the
    fact scan, the grouped HAVING runs with map-side combine, and the
    outer IN is another semi join against the (tiny) qualifying-supplier
    set. l_quantity values are integral doubles, so the plain SUM is
    exact on both engines."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    promo = table(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    qualifying = (
        li.join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )
