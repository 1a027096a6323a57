"""As-of (merge) join: for each left row, the latest right row with
``right_time <= left_time`` per key.

Not in the reference (SURVEY.md §2.2 joins note) but a staple of
event/market data. Implemented WITHOUT a range join: a range join
materializes every (left, earlier-right) pair before deduplication —
quadratic per key. Instead, union both sides tagged, sort once within
each key, and carry the last non-null right row forward with
``last(..., ignorenulls=True)`` over a running frame:

    union -> one shuffle on key -> one sort on (time, side) -> window

Cost is one shuffle+sort of |L|+|R| rows regardless of match fan-out —
the shape that survives 100 TB. Right rows at exactly the left time
match (<=): the side tag sorts right-before-left on time ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_alias: str = "asof",
) -> DataFrame:
    """Left as-of join. Returns every left column plus a struct column
    ``right_alias`` holding the matched right row (null when no right
    row precedes the left row)."""
    right_struct_type = T.StructType(right.schema.fields)
    lu = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(right_struct_type).alias("_r"),
    )
    ru = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(T.StructType(left.schema.fields)).alias("_l"),
        F.struct(*[F.col(c) for c in right.columns]).alias("_r"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        lu.unionByName(ru)
        .withColumn(right_alias, F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
        .select("_l.*", right_alias)
    )
