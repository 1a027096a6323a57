"""Modern SQL-surface capabilities (Spark 4 features).

* `recursive_nation_chain` — `WITH RECURSIVE` executed VERBATIM by
  both engines (Spark 4 added recursive CTEs): hierarchy walk down a
  per-region successor chain derived with a window function. The
  registry's other iterative queries loop in the driver
  (queries/iterative.py); this one proves the declarative recursion
  surface itself.
* `variant_shred_props` — the VARIANT semi-structured type:
  `parse_json` once into a variant column, typed `variant_get`
  extraction after. Unlike `from_json` (fixed schema up front,
  queries/events.py), variant keeps the full document queryable while
  still shredding typed paths at columnar speed — the open-schema
  ingestion shape (oracle: DuckDB JSON extraction, same values).
* `sql_scalar_udf` — `CREATE TEMPORARY FUNCTION ... RETURN <expr>`
  (SQL-defined scalar UDF): the function body is a SQL expression, so
  Catalyst INLINES it — zero Python, full codegen; the oracle inlines
  the same expression by hand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crane_spark.queries.core import register
from crane_spark.tables import table

RECURSIVE_SQL = """
WITH RECURSIVE edges AS (
  SELECT n_regionkey, n_nationkey AS src,
         lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
  FROM nation
),
roots AS (
  SELECT n_regionkey, min(n_nationkey) AS nk FROM nation GROUP BY n_regionkey
),
chain AS (
  SELECT n_regionkey, nk, CAST(0 AS BIGINT) AS depth FROM roots
  UNION ALL
  SELECT e.n_regionkey, e.dst AS nk, c.depth + 1
  FROM chain c JOIN edges e ON e.n_regionkey = c.n_regionkey AND e.src = c.nk
  WHERE e.dst IS NOT NULL
)
SELECT n_regionkey, CAST(count(*) AS BIGINT) AS chain_len,
       CAST(max(depth) AS BIGINT) AS max_depth,
       CAST(sum(depth) AS BIGINT) AS depth_sum
FROM chain GROUP BY n_regionkey
"""


@register("recursive_nation_chain", RECURSIVE_SQL, tags=("sql", "recursive", "iterative"))
def q_recursive_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE, one SQL text for both engines: walk each
    region's nation chain (successor edges from a lead() window) from
    the root to the end, counting depth. Each recursive step is a
    join against the vocabulary-sized edge list; Spark executes the
    fixpoint loop inside the engine (no driver round-trips), with the
    same UNION ALL semantics DuckDB applies."""
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(RECURSIVE_SQL)


VARIANT_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
       CAST(sum(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) >= 50
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM events
GROUP BY event_type
"""


@register("variant_shred_props", VARIANT_SQL, tags=("json", "variant", "agg"))
def q_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion: parse the JSON props column ONCE into a
    variant value, then pull typed paths with `variant_get`. The
    parse cost is paid per row (as with from_json) but the document
    stays open-schema — new fields need no reload, and Spark shreds
    the accessed paths into columnar form. Integer aggregates are
    exact in any order."""
    ev = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(F.col("v"), "$.k", "bigint")
    return (
        ev.select("event_type", v.alias("v"))
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
            F.sum(F.when(F.col("k") >= 50, 1).otherwise(0)).alias("n_high"),
        )
    )


SQL_UDF_ORACLE = """
SELECT band, CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4)))
            AS DOUBLE) AS revenue
FROM (
  SELECT CASE WHEN l_discount < 0.03 THEN 'low'
              WHEN l_discount < 0.07 THEN 'mid'
              ELSE 'high' END AS band,
         l_extendedprice, l_discount
  FROM lineitem
)
GROUP BY band
"""


@register("sql_scalar_udf", SQL_UDF_ORACLE, tags=("sql", "udf", "agg"))
def q_sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar function (CREATE TEMPORARY FUNCTION ...
    RETURN expr): user-extensible like a Python UDF, but the body is a
    SQL expression Catalyst inlines into the plan — it runs inside
    WholeStageCodegen at built-in speed, the way every hot-path
    'UDF' should ship at 100 TB. Revenue sums ride DECIMAL for
    order-independence."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION discount_band(d DOUBLE) "
        "RETURNS STRING RETURN "
        "CASE WHEN d < 0.03 THEN 'low' WHEN d < 0.07 THEN 'mid' ELSE 'high' END"
    )
    return spark.sql(
        """
        SELECT discount_band(l_discount) AS band,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4)))
                    AS DOUBLE) AS revenue
        FROM lineitem GROUP BY discount_band(l_discount)
        """
    )


FILTERED_AGG_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(*) FILTER (WHERE o_totalprice > 100000) AS BIGINT) AS n_big,
       CAST(sum(CAST(o_totalprice AS DECIMAL(28,2)))
            FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_total,
       CAST(count(*) FILTER (WHERE year(o_orderdate) = 1997) AS BIGINT) AS n_1997
FROM orders
GROUP BY o_orderstatus
"""


@register("filtered_aggregates", FILTERED_AGG_SQL, tags=("sql", "agg", "filter-clause"))
def q_filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate FILTER clause, one SQL text for both engines: several
    differently-predicated aggregates in ONE scan + ONE hash-agg
    (the alternative — one query per predicate — multiplies full-table
    scans, the classic dashboard anti-pattern at 100 TB). Decimal sums
    keep the money aggregate order-independent."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(FILTERED_AGG_SQL)


GROUP_BY_ALL_SQL = """
SELECT o_orderstatus,
       o_orderpriority,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total
FROM orders
GROUP BY ALL
ORDER BY ALL
"""


@register("sql_group_by_all", GROUP_BY_ALL_SQL, tags=("sql", "agg", "modern-sql"))
def q_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL — the modern-SQL shorthand both
    engines execute from the SAME text: every non-aggregate select
    item becomes a grouping key, the whole output sorts on every
    column. One text, two engines, zero column-list drift (the
    maintenance bug this syntax exists to kill)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(GROUP_BY_ALL_SQL)
