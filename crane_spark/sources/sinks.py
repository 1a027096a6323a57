"""Output layout control: the write-side half of the 100 TB story.

A dataset is only as queryable as its layout: partition columns drive
partition pruning, in-file sort order drives min/max row-group skipping,
and file count/size drive scan parallelism. These helpers make the
layout explicit instead of inheriting whatever partitioning the last
shuffle left behind.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_within: list[str] | None = None,
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet with controlled file count and in-file order.

    ``repartition(partition cols)`` routes each output partition's rows
    to the same task (otherwise every task writes a sliver of every
    partition — the small-files problem), and ``sortWithinPartitions``
    lays rows out so parquet min/max stats actually skip row groups for
    range predicates on the sort key.
    """
    out = df.repartition(
        *([files_per_partition * max(len(partition_by), 1)] if not partition_by else []),
        *[F.col(c) for c in partition_by],
    )
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    out.write.mode(mode).partitionBy(*partition_by).parquet(path)


def zorder_key(*cols, bits: int = 16):
    """Morton (z-order) interleave of 2+ non-negative int columns.

    Inputs must already be normalized to ``[0, 2**bits)`` — raw values
    wider than ``bits`` alias modulo 2**bits and the curve degrades to
    noise (``write_zordered`` min/max-normalizes for you). The low
    ``bits`` bits of each column are bit-interleaved into one long, so
    sorting by the result clusters rows that are close in EVERY
    dimension at once. Files written in z-order carry tight min/max
    stats on all interleaved columns simultaneously — parquet
    row-group skipping then prunes on whichever dimension a query
    filters, instead of only the primary sort column. Pure bit
    arithmetic (shifts and masks), whole-stage codegen, no shuffle.
    """
    parts = []
    for ci, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        for b in range(bits):
            # bit b of column ci lands at position b*len(cols)+ci
            parts.append(
                F.shiftleft(
                    F.shiftright(col, b).bitwiseAND(F.lit(1)),
                    b * len(cols) + ci,
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    n_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Rewrite a dataset range-partitioned AND sorted by the z-order
    key: repartitionByRange splits the z-curve into ``n_files``
    contiguous chunks (each file owns a compact hyper-rectangle-ish
    region), and the in-file sort keeps row groups tight inside it.

    Each column is min/max-normalized onto the shared ``bits``-wide
    grid first — one cheap stats scan (at warehouse scale these come
    from table statistics for free); without it, any column whose
    range exceeds 2**bits aliases and stops clustering."""
    span = F.lit(float((1 << bits) - 1))
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{i}") for i, c in enumerate(zorder_by)],
        *[F.max(c).cast("double").alias(f"mx_{i}") for i, c in enumerate(zorder_by)],
    ).first()
    normed = []
    for i, c in enumerate(zorder_by):
        mn, mx = stats[f"mn_{i}"], stats[f"mx_{i}"]
        width = (mx - mn) or 1.0
        normed.append(
            ((F.col(c).cast("double") - F.lit(mn)) * span / F.lit(width)).cast("long")
        )
    key = zorder_key(*normed, bits=bits)
    (
        df.withColumn("__z", key)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def compact(
    spark_df: DataFrame, path: str, target_files: int, mode: str = "overwrite"
) -> None:
    """Rewrite a dataset as ``target_files`` files (coalesce avoids a
    shuffle when reducing; small-file compaction is periodic maintenance
    for any streaming append sink)."""
    spark_df.coalesce(target_files).write.mode(mode).parquet(path)
