"""Statistical aggregates with cross-engine-exact formulations.

Built-in stddev/variance/corr accumulate floats in engine-specific
order, so they can't hash-match an oracle. Instead the moments are
assembled from DECIMAL-exact sums (sum, sum of squares, sum of
products): the only float operations are a fixed sequence of scalar
ops on identical doubles — bit-identical everywhere, and exactly the
map-side-combinable shape that scales (each partial is 5 numbers).

Percentiles use linear interpolation (type-7), which Spark's
``percentile`` and DuckDB's ``quantile_cont`` share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crane_spark.queries.core import register
from crane_spark.tables import table

PERCENTILE_SQL = """
SELECT o_orderstatus,
       median(o_totalprice) AS median_price,
       quantile_cont(o_totalprice, 0.9) AS p90_price,
       quantile_cont(o_totalprice, 0.99) AS p99_price,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderstatus
"""


@register("percentiles_by_status", PERCENTILE_SQL, tags=("agg", "percentile"))
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return orders.groupBy("o_orderstatus").agg(
        F.percentile(p, 0.5).alias("median_price"),
        F.percentile(p, 0.9).alias("p90_price"),
        F.percentile(p, 0.99).alias("p99_price"),
        F.min(p).alias("min_price"),
        F.max(p).alias("max_price"),
    )


MOMENTS_SQL = """
WITH s AS (
  SELECT o_orderstatus,
         count(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(o_custkey AS DECIMAL(28,0))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(o_custkey * o_custkey AS DECIMAL(38,0))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(o_totalprice * o_custkey AS DECIMAL(38,2))) AS DOUBLE) AS sxy
  FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, n,
       round((sxx - sx * sx / n) / (n - 1), 4) AS var_price,
       round(sqrt((sxx - sx * sx / n) / (n - 1)), 4) AS stddev_price,
       round((sxy - sx * sy / n)
             / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 6) AS corr_price_cust
FROM s
"""


@register("moments_by_status", MOMENTS_SQL, tags=("agg", "stats"))
def q_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance/stddev/correlation from exact decimal sums — the
    deterministic twin of stddev_samp/corr."""
    orders = table(spark, sf_dir, "orders")
    p, c = F.col("o_totalprice"), F.col("o_custkey")
    n = F.count(F.lit(1))
    sx = F.sum(p.cast("decimal(28,2)")).cast("double")
    sxx = F.sum((p * p).cast("decimal(38,4)")).cast("double")
    sy = F.sum(c.cast("decimal(28,0)")).cast("double")
    syy = F.sum((c * c).cast("decimal(38,0)")).cast("double")
    sxy = F.sum((p * c).cast("decimal(38,2)")).cast("double")
    base = orders.groupBy("o_orderstatus").agg(
        n.alias("n"), sx.alias("sx"), sxx.alias("sxx"),
        sy.alias("sy"), syy.alias("syy"), sxy.alias("sxy"),
    )
    nn = F.col("n")
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / nn) / (nn - 1)
    corr = (F.col("sxy") - F.col("sx") * F.col("sy") / nn) / (
        F.sqrt(F.col("sxx") - F.col("sx") * F.col("sx") / nn)
        * F.sqrt(F.col("syy") - F.col("sy") * F.col("sy") / nn)
    )
    return base.select(
        "o_orderstatus",
        "n",
        F.round(var, 4).alias("var_price"),
        F.round(F.sqrt(var), 4).alias("stddev_price"),
        F.round(corr, 6).alias("corr_price_cust"),
    )


# r7 (verdict #5): converted from rows-only to the DIFFERENTIAL shape.
# The quantile summaries' estimates are partition-merge-order-
# dependent (never hashable), but the algorithm's WORST-CASE rank
# guarantee — the returned value's exact rank lies within n/accuracy
# of the requested fraction — holds for every merge order, so the
# per-fraction flags are deterministically TRUE and hash, while the
# exact group count rides along as the hashed value column.
APPROX_PCT_SQL = """
SELECT o_orderstatus, count(*) AS n_orders,
       TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
FROM orders GROUP BY o_orderstatus
"""

_PCT_ACCURACY = 10_000
# the documented guarantee is 1/accuracy of rank; verify at 2x slack
# so boundary-row double arithmetic can never flip a flag
_PCT_EPS = 2.0 / _PCT_ACCURACY


@register(
    "approx_percentiles_by_status",
    APPROX_PCT_SQL,
    tags=("agg", "approx", "percentile", "differential"),
)
def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (quantile sketch) per group — the sketch the
    100 TB path uses when exact percentiles would buffer whole groups
    — oracle-checked via its RANK GUARANTEE (r7): pass 1 aggregates
    the sketch per status (3 tiny rows, broadcast back); pass 2 counts
    rows <=/< each returned value and flags that its exact rank lands
    within 2/accuracy of the requested fraction. The estimates
    themselves are merge-order-dependent and deliberately NOT output;
    the flags are TRUE for every merge order by the algorithm's
    worst-case bound (Greenwald-Khanna style summaries). The exact
    twin remains `percentiles_by_status`."""
    orders = table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    pct = F.approx_percentile(
        p, F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), _PCT_ACCURACY
    )
    appr = orders.groupBy("o_orderstatus").agg(pct.alias("pcts"))
    joined = orders.join(F.broadcast(appr), "o_orderstatus")
    n = F.count(F.lit(1))

    def rank_ok(i: int, frac: float):
        # +/-2 rows of ABSOLUTE slack on top of the relative bound:
        # below err*n ~ 1 row (tiny groups, where the summaries run
        # exact) the implementation's ceil/rounding choices can move
        # the returned rank by one, which a purely relative bound
        # would mis-flag.
        v = F.col("pcts")[i]
        le = F.sum(F.when(p <= v, 1).otherwise(0))
        lt = F.sum(F.when(p < v, 1).otherwise(0))
        return (le >= F.ceil(F.lit(frac - _PCT_EPS) * n) - F.lit(2)) & (
            lt <= F.floor(F.lit(frac + _PCT_EPS) * n) + F.lit(2)
        )

    return joined.groupBy("o_orderstatus").agg(
        n.alias("n_orders"),
        rank_ok(0, 0.5).alias("p50_ok"),
        rank_ok(1, 0.9).alias("p90_ok"),
        rank_ok(2, 0.99).alias("p99_ok"),
    )


# --------------------------------------------------------------------
# Mergeable-sketch rollups: the re-aggregation pattern that makes
# 100 TB distinct-count dashboards possible (persist small per-segment
# sketches once; every rollup after that merges sketches instead of
# rescanning the fact table).
# --------------------------------------------------------------------

BITMAP_SQL = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders
GROUP BY 1
"""


@register("bitmap_distinct_rollup", BITMAP_SQL, tags=("agg", "sketch", "bitmap"))
def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct customers per year via two-level bitmap merge:
    level 1 builds one fixed-size bitmap per (year, month, key-bucket)
    — the per-segment partial a warehouse would persist — and level 2
    OR-merges bitmaps and sums per-bucket cardinalities. Unlike a
    count-distinct expand, the re-aggregation never touches raw keys
    (each partial is a few KB regardless of row count), yet the result
    is exact, so the oracle is a plain COUNT(DISTINCT)."""
    orders = table(spark, sf_dir, "orders")
    lvl1 = (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
            F.bitmap_bucket_number("o_custkey").alias("bucket"),
        )
        .agg(F.bitmap_construct_agg(F.bitmap_bit_position("o_custkey")).alias("bm"))
    )
    return (
        lvl1.groupBy("o_year", "bucket")
        .agg(F.bitmap_count(F.bitmap_or_agg("bm")).alias("bucket_distinct"))
        .groupBy("o_year")
        .agg(F.sum("bucket_distinct").alias("n_customers"))
    )


HLL_SQL = None  # Datasketches HLL binaries are engine-specific: rows-only


@register("hll_rollup_regions", HLL_SQL, tags=("agg", "sketch", "approx", "hll"))
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct customers per region by UNIONING per-nation
    Datasketches HLL sketches — the mergeable twin of
    `bitmap_distinct_rollup` for key spaces too wide for bitmaps.
    Nation-level sketches aggregate once from the fact rows; the
    region rollup is hll_union_agg over 25 sketch blobs (no second
    fact scan). Engine-specific sketch -> rows-only contract;
    tests/test_stats bounds the estimate against the exact count."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    per_nation = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_regionkey", "n_nationkey")
        .agg(F.hll_sketch_agg("c_custkey", F.lit(14)).alias("sk"))
    )
    return (
        per_nation.groupBy(F.col("n_regionkey").cast("long").alias("regionkey"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_customers"),
            F.count(F.lit(1)).cast("long").alias("n_nations"),
        )
    )


@register("rolling_7d_hll", None, tags=("window", "sketch", "approx", "hll", "timeseries"))
def q_rolling_7d_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-backed twin of `rolling_7d_active_users`: one HLL
    sketch per DAY (a single pass over deduped user-days), then each
    day's 7-day answer is hll_union_agg over at most 7 sketch blobs.
    This is THE rolling-distinct plan at 100 TB — the exact variant
    re-explodes every user-day pair 7x, while this one shuffles ~30
    sketch blobs however wide the user space is, and yesterday's
    per-day sketches never recompute on a growing corpus.
    Engine-specific sketch -> rows-only; the error bound vs the exact
    query is asserted in tests/test_stats.py."""
    events = table(spark, sf_dir, "events")
    per_day = (
        events.select(F.to_date("ts").alias("d"), "user_id")
        .groupBy("d")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    days = per_day.select("d")
    contrib = per_day.select(
        F.explode(F.sequence(F.col("d"), F.date_add("d", 6))).alias("day"), "sk"
    )
    return (
        contrib.join(days, contrib.day == days.d, "left_semi")
        .groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("wau_7d_approx"))
    )
