"""As-of (merge) join: for each left row, the nearest right row at or
before (backward) / at or after (forward) its time, per key.

Not in the reference (SURVEY.md §2.2 joins note) but a staple of
event/market data. Implemented WITHOUT a range join: a range join
materializes every (left, candidate-right) pair before deduplication —
quadratic per key. Instead, union both sides tagged, sort once within
each key, and carry the nearest right row across with a running-frame
window (``last(.., ignorenulls)`` looking back, or ``first`` looking
forward):

    union -> one shuffle on key -> one sort on (time, side) -> window

Cost is one shuffle+sort of |L|+|R| rows regardless of match fan-out —
the shape that survives 100 TB. Time ties match in both directions
(<= / >=): the side tag orders the right row on the matchable side of
the left row at equal times.

``tolerance`` bounds the match distance: the nearest match is found
first, then nullified if it is farther than the tolerance — equivalent
to constraining the search, since if the nearest row is out of range,
every other row is too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_alias: str = "asof",
    direction: str = "backward",
    tolerance: Column | None = None,
) -> DataFrame:
    """Left as-of join. Returns every left column plus a struct column
    ``right_alias`` holding the matched right row (null when no right
    row qualifies).

    direction: 'backward' (latest right at-or-before left, default) or
    'forward' (earliest right at-or-after left). tolerance: optional
    Column (e.g. ``F.expr("INTERVAL 1 HOUR")``) nullifying matches
    farther than that from the left time.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    backward = direction == "backward"
    right_struct_type = T.StructType(right.schema.fields)
    # At equal times the right row must sort on the matchable side of
    # the left row: before it when looking back, after it when looking
    # forward.
    left_ord, right_ord = (1, 0) if backward else (0, 1)
    lu = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(left_ord).alias("_ord"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(right_struct_type).alias("_r"),
    )
    ru = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(right_ord).alias("_ord"),
        F.lit(None).cast(T.StructType(left.schema.fields)).alias("_l"),
        F.struct(*[F.col(c) for c in right.columns]).alias("_r"),
    )
    base = Window.partitionBy("_k").orderBy("_t", "_ord")
    if backward:
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carried = F.last("_r", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carried = F.first("_r", ignorenulls=True).over(w)
    out = (
        lu.unionByName(ru)
        .withColumn(right_alias, carried)
        .filter(F.col("_is_left") == 1)
    )
    if tolerance is not None:
        m = F.col(right_alias)
        lt, rt = F.col("_t"), m[right_time]
        in_range = (lt - rt <= tolerance) if backward else (rt - lt <= tolerance)
        out = out.withColumn(
            right_alias, F.when(m.isNotNull() & in_range, m)
        )
    return out.select("_l.*", right_alias)
