"""Reference-parity topologies as DataFrame transforms.

The reference ships exactly three dataflow topologies (SURVEY.md §2.1);
each is re-expressed here as a pure DataFrame function usable in batch
AND Structured Streaming (the same logical plan runs under
``readStream`` — see crane_spark.streaming.pipelines).

1. WordCount    — split lines on ' ', count per token
   (ref: app/word_count_topology.py:4-38)
2. TwitterUserFilter — keep rows with numeric field > 50, global count
   (ref: app/twitter_user_filter_topology.py:4-33)
3. PageRank contribution round — explode outlinks, contribute
   1/(outdegree+1) to each target, sum per target
   (ref: app/page_rank_topology.py:4-38)

Scale notes: tokenize/explode is narrow (no shuffle); the counts are
partial-aggregated map-side by Catalyst before the single shuffle on
the group key — strictly better than the reference's random-routing +
single-master final merge (crane_master.py:95-98), which serializes the
final aggregation on one node.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crane_spark.functions.aggregates import dsum
from crane_spark.tables import fan_out


def wordcount(lines: DataFrame, text_col: str = "value") -> DataFrame:
    """Token frequency over a column of text lines.

    Matches SplitBolt + CountBolt semantics: split on a single space
    (empty tokens from repeated spaces ARE counted, as in Python's
    ``'a  b'.split(' ')`` — ref word_count_topology.py:13).
    """
    return (
        lines.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def global_filter_count(
    df: DataFrame, predicate: Column, result_name: str = "result_count"
) -> DataFrame:
    """Filter then global count — TwitterUserFilter's FilterBolt +
    CountBolt (emit ('result', n)). One-row result; Catalyst plans a
    partial count per partition + single final merge."""
    return df.filter(predicate).agg(F.count(F.lit(1)).alias(result_name))


def pagerank_contributions(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """One PageRank contribution round over an edge list.

    The reference parses adjacency rows and weights each outlink by
    1/(outdegree+1) (page_rank_topology.py:14-17 — the +1 counts the
    source vertex itself). Input here is a normalized (src, dst) edge
    list; the outdegree join is computed once and reused.

    Contributions are summed through DECIMAL(28,12) so the float total
    is independent of shuffle order (see functions.aggregates).

    Outdegree comes from a window count over ``src`` rather than a
    groupBy + self-join: one scan of the edge list and two exchanges
    (src, then dst) instead of three, which matters when the edge list
    is the 100 TB fact table. No fan_out here: the window's own
    partitionBy(src) exchange already spreads a narrow input across
    the cluster, so pre-repartitioning would be a third, wasted
    shuffle of the full edge list (measured 2x on the sf0.1 bench).
    """
    from pyspark.sql import Window

    outdeg = F.count(F.lit(1)).over(Window.partitionBy(src))
    contrib = (F.lit(1.0) / (outdeg + 1)).alias("contrib")
    return (
        edges.select(F.col(dst).alias("url"), contrib)
        .groupBy("url")
        .agg(dsum(F.col("contrib"), scale=12).alias("rank"))
    )


def pagerank_iterations(
    edges: DataFrame,
    iterations: int = 10,
    reset: float = 0.15,
    reliable_every: int = 0,
) -> DataFrame:
    """Full iterative PageRank (extension beyond the reference's single
    round). Driver-side loop over DataFrames; each iteration is one
    shuffle on dst. Ranks are checkpointed every few rounds via
    localCheckpoint to truncate lineage — the classic Spark iterative-
    algorithm pitfall (SURVEY.md §7 risk list). ``reliable_every=N``
    makes every Nth round's checkpoint a durable ``df.checkpoint()``
    so a long run survives executor loss with bounded replay
    (operators/caching.py docstring); output is bit-identical either
    way.
    """
    degrees = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdegree"))
    vertices = (
        edges.select(F.col("src").alias("vid"))
        .union(edges.select(F.col("dst")))
        .distinct()
    )
    ranks = vertices.select("vid", F.lit(1.0).alias("rank"))
    prev_ck = None
    for i in range(iterations):
        contribs = (
            edges.join(degrees, "src")
            .join(ranks, edges["src"] == ranks["vid"])
            .select(
                F.col("dst").alias("vid"),
                (F.col("rank") / F.col("outdegree")).alias("contrib"),
            )
            .groupBy("vid")
            .agg(F.sum("contrib").alias("contrib_sum"))
        )
        ranks = (
            vertices.join(contribs, "vid", "left")
            .select(
                "vid",
                (
                    F.lit(reset) + F.lit(1.0 - reset) * F.coalesce("contrib_sum", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % 4 == 0:
            from crane_spark.operators.caching import (
                loop_checkpoint,
                release_local_checkpoint,
            )

            ranks = loop_checkpoint(ranks, (i + 1) // 4, reliable_every)
            if prev_ck is not None:
                release_local_checkpoint(prev_ck)
            prev_ck = ranks
    return ranks
