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


def compact(
    spark_df: DataFrame, path: str, target_files: int, mode: str = "overwrite"
) -> None:
    """Rewrite a dataset as ``target_files`` files (coalesce avoids a
    shuffle when reducing; small-file compaction is periodic maintenance
    for any streaming append sink)."""
    spark_df.coalesce(target_files).write.mode(mode).parquet(path)
