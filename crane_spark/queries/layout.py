"""Data-layout quality measured as a query: `zorder_locality`.

Write-side layout (operators/layout.zorder_write) decides read-side
pruning: a parquet scan with a predicate on column c skips exactly
the files/row groups whose [min(c), max(c)] miss the predicate, so
the *average normalized per-dimension width* of a file is the
fraction of the table a point/box query on that dimension must read.
This query computes that width for two candidate 64-file layouts of
lineitem over (l_partkey, l_suppkey):

* ``linear`` — files are uniform ranges of l_partkey alone (the
  "sort by one column" layout): partkey width ~1/64, suppkey width
  ~1 (useless stats on the second dimension);
* ``zorder`` — files are runs of the Morton interleave of 5-bit
  uniform bucket ranks: BOTH widths ~1/8 (64 files over 2 dims =>
  8x8 grid), the k-th-root selectivity trade.

Everything up to the final division is exact integer arithmetic
(div/mod bucket ranks, interleave polynomial, long width sums) built
from the same fragment generators as the write path, so the DuckDB
oracle hash-matches bit for bit; the one double division is written
identically on both sides.

The plan is one scan + broadcast extents + two grouped aggregations
over file ids (<= 64 groups each) — no windows, no data-sized
single-partition stages; at 100 TB it is a pair of map-side-combined
aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crane_spark.operators.layout import morton_expr, uniform_bucket_expr
from crane_spark.queries.core import register
from crane_spark.tables import table

_BITS = 5  # 32 buckets/dim; 10-bit z; z div 16 -> 64 file blocks
_B = 1 << _BITS
_FILES = 64


def _locality_sql() -> str:
    bucket_p = uniform_bucket_expr("lp", "p0", "p1", _B, div="//")
    bucket_s = uniform_bucket_expr("ls", "s0", "s1", _B, div="//")
    bucket_lin = uniform_bucket_expr("lp", "p0", "p1", _FILES, div="//")
    morton = morton_expr(["bp", "bs"], _BITS, div="//")
    return f"""
WITH ext AS (
  SELECT CAST(min(l_partkey) AS BIGINT) AS p0, CAST(max(l_partkey) AS BIGINT) AS p1,
         CAST(min(l_suppkey) AS BIGINT) AS s0, CAST(max(l_suppkey) AS BIGINT) AS s1
  FROM lineitem
),
b AS (
  SELECT CAST(l_partkey AS BIGINT) AS lp, CAST(l_suppkey AS BIGINT) AS ls,
         p0, p1, s0, s1
  FROM lineitem CROSS JOIN ext
),
zb AS (
  SELECT lp, ls, p0, p1, s0, s1,
         {bucket_p} AS bp, {bucket_s} AS bs, {bucket_lin} AS fl
  FROM b
),
zf AS (
  SELECT lp, ls, p0, p1, s0, s1, fl, {morton} // 16 AS fz
  FROM zb
),
zg AS (
  SELECT fz, max(lp) - min(lp) + 1 AS wp, max(ls) - min(ls) + 1 AS ws,
         max(p1 - p0 + 1) AS pr, max(s1 - s0 + 1) AS sr
  FROM zf GROUP BY fz
),
lg AS (
  SELECT fl, max(lp) - min(lp) + 1 AS wp, max(ls) - min(ls) + 1 AS ws,
         max(p1 - p0 + 1) AS pr, max(s1 - s0 + 1) AS sr
  FROM zf GROUP BY fl
),
agg AS (
  SELECT 'zorder' AS layout, CAST(count(*) AS BIGINT) AS n_files,
         CAST(sum(wp) AS BIGINT) AS swp, CAST(sum(ws) AS BIGINT) AS sws,
         max(pr) AS pr, max(sr) AS sr
  FROM zg
  UNION ALL
  SELECT 'linear', CAST(count(*) AS BIGINT),
         CAST(sum(wp) AS BIGINT), CAST(sum(ws) AS BIGINT), max(pr), max(sr)
  FROM lg
)
SELECT layout, n_files,
       CAST(round(CAST(swp AS DOUBLE) / (CAST(n_files AS DOUBLE) * CAST(pr AS DOUBLE)), 9) AS DOUBLE) AS part_locality,
       CAST(round(CAST(sws AS DOUBLE) / (CAST(n_files AS DOUBLE) * CAST(sr AS DOUBLE)), 9) AS DOUBLE) AS supp_locality
FROM agg
ORDER BY layout
"""


@register(
    "zorder_locality",
    _locality_sql(),
    tags=("layout", "scale", "agg"),
)
def q_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file min/max locality of a Z-order vs single-column-range
    64-file layout of lineitem over (l_partkey, l_suppkey) — the
    read-amplification each layout implies for box predicates. See
    module docstring; shares its bucket/interleave fragment generators
    with operators/layout.zorder_write so the measured layout is
    exactly the one the writer produces."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("long").alias("lp"),
        F.col("l_suppkey").cast("long").alias("ls"),
    )
    ext = li.agg(
        F.min("lp").alias("p0"),
        F.max("lp").alias("p1"),
        F.min("ls").alias("s0"),
        F.max("ls").alias("s1"),
    )
    d = (
        li.crossJoin(F.broadcast(ext))
        .withColumn("bp", F.expr(uniform_bucket_expr("lp", "p0", "p1", _B)))
        .withColumn("bs", F.expr(uniform_bucket_expr("ls", "s0", "s1", _B)))
        .withColumn("fl", F.expr(uniform_bucket_expr("lp", "p0", "p1", _FILES)))
        .withColumn("fz", F.expr(f"{morton_expr(['bp', 'bs'], _BITS)} div 16"))
    )

    def per_file(file_col: str, label: str) -> DataFrame:
        g = d.groupBy(file_col).agg(
            (F.max("lp") - F.min("lp") + F.lit(1)).alias("wp"),
            (F.max("ls") - F.min("ls") + F.lit(1)).alias("ws"),
            F.max(F.col("p1") - F.col("p0") + F.lit(1)).alias("pr"),
            F.max(F.col("s1") - F.col("s0") + F.lit(1)).alias("sr"),
        )
        return g.agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("wp").alias("swp"),
            F.sum("ws").alias("sws"),
            F.max("pr").alias("pr"),
            F.max("sr").alias("sr"),
        ).withColumn("layout", F.lit(label))

    agg = per_file("fz", "zorder").unionByName(per_file("fl", "linear"))
    return agg.select(
        "layout",
        "n_files",
        F.round(
            F.col("swp").cast("double")
            / (F.col("n_files").cast("double") * F.col("pr").cast("double")),
            9,
        ).alias("part_locality"),
        F.round(
            F.col("sws").cast("double")
            / (F.col("n_files").cast("double") * F.col("sr").cast("double")),
            9,
        ).alias("supp_locality"),
    ).orderBy("layout")
