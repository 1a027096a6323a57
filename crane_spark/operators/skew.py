"""Skew-handling aggregation: two-phase salted group-by.

At 100 TB a handful of hot keys (empty documents, null-ish defaults,
bot user_ids) can make one shuffle partition carry most of the data.
AQE's skew-join splitting handles joins; for aggregations whose partial
aggregate alone can't compress (e.g. collect-like or very wide
aggregates), the classic fix is salting: spread each key over
``salt_buckets`` sub-keys, aggregate partially per (key, salt), then
merge per key — two small shuffles instead of one skewed one.

For plain sums/counts Catalyst's map-side partial aggregation already
defuses most skew; this operator exists for the cases where it can't,
and as the documented pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crane_spark.functions.aggregates import dsum


def salted_groupby_sum(
    df: DataFrame,
    key: str,
    value: str | Column,
    scale: int = 2,
    salt_buckets: int = 16,
) -> DataFrame:
    """Exact per-key (sum, count) via salted two-phase aggregation.

    The salt spreads rows of one key across ``salt_buckets`` reducers
    (monotonically_increasing_id is per-row unique, so the distribution
    is uniform regardless of the key's skew). Decimal-routed sums make
    the result identical to the direct single-phase group-by.
    """
    value = F.col(value) if isinstance(value, str) else value
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets)).alias("_salt")
    partial = (
        df.select(F.col(key), value.cast(f"decimal(28,{scale})").alias("_v"), salt)
        .groupBy(key, "_salt")
        .agg(F.sum("_v").alias("_vs"), F.count(F.lit(1)).alias("_n"))
    )
    return partial.groupBy(key).agg(
        F.sum("_vs").cast("double").alias("value_sum"),
        F.sum("_n").alias("n_rows"),
    )


def skewed_key_report(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnostic: the keys that would dominate a shuffle, with their
    share of the table — run this before choosing a partitioning."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.col("n_rows") / F.lit(float(total)))
        .orderBy(F.desc("n_rows"), F.asc(key))
        .limit(top)
    )


def dsum_by(df: DataFrame, key: str, value: str | Column, scale: int = 2) -> DataFrame:
    """Direct single-phase twin of salted_groupby_sum (for equivalence
    testing and for the non-skewed fast path)."""
    value = F.col(value) if isinstance(value, str) else value
    return df.groupBy(key).agg(
        dsum(value, scale).alias("value_sum"), F.count(F.lit(1)).alias("n_rows")
    )
