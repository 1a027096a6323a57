"""Operator-level building blocks (reference-parity topologies)."""

from crane_spark.operators.topology import (
    global_filter_count,
    pagerank_contributions,
    wordcount,
)

__all__ = ["wordcount", "global_filter_count", "pagerank_contributions"]
