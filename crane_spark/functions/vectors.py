"""Vector math over ArrayType(FloatType) embedding columns.

All expressions use F.zip_with / F.aggregate (JVM higher-order
functions) over fixed-order arrays, so dot products accumulate
left-to-right deterministically — the same order DuckDB's list
functions use, which keeps the oracle hash-stable. Elements are cast
to double before any arithmetic (float32 upcast is exact).

For 100 TB-scale ANN, brute force is the correctness baseline and the
IVF path (crane_spark.llm.similarity) prunes candidates by centroid
assignment before the exact re-rank.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_vec(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def vec_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a, b); both inputs must already be array<double>."""
    return dot(a, b) / (vec_norm(a) * vec_norm(b))


def sql_dot(a: str, b: str, dim: int) -> str:
    """DuckDB twin of :func:`dot` for fixed-dimension vectors."""
    return (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def sql_norm(a: str, dim: int) -> str:
    return (
        f"sqrt(list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    )
