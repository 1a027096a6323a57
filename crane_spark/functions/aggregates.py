"""Exact (order-independent) float aggregation.

Summing IEEE doubles is order-dependent, and Spark's shuffle order is
nondeterministic — two runs (or two engines) can disagree in the last
ulp. Every money/measure aggregate in the engine therefore routes
through a fixed-scale DECIMAL: cast each addend to DECIMAL(28, s)
(exact for the 2-6 decimal data in the schema), sum exactly, and cast
the final value back to DOUBLE. The result is bit-identical regardless
of partitioning, parallelism, or engine — which is what makes the
DuckDB value-hash oracle viable — and it costs one codegen'd cast per
row, nothing at 100 TB scale.

The ``sql_*`` twins emit the identical computation as ANSI SQL for the
oracle side, so Spark and DuckDB always run the same arithmetic.

Reference lineage: the reference's aggregating bolts sum Python ints/
floats in a dict and merge at the master (word_count_topology.py:29-38,
crane_master.py:95-98); partial/final split here is Catalyst's
automatic partial_sum over the decimal column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# 28 integral+fractional digits: sums of 1e12 rows of 1e9-sized values
# still fit, while staying under Spark's 38-digit cap after the +10
# precision bump sum() applies.
PRECISION = 28


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact sum of a double column, returned as double."""
    col = F.col(col) if isinstance(col, str) else col
    return F.sum(col.cast(T.DecimalType(PRECISION, scale))).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Exact-sum average: decimal sum cast to double, over count."""
    col = F.col(col) if isinstance(col, str) else col
    return dsum(col, scale) / F.count(F.lit(1))


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB-side twin of :func:`dsum` (same arithmetic, same result)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({PRECISION},{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    return f"{sql_dsum(expr, scale)} / COUNT(*)"
