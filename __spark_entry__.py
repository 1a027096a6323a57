"""Driver contract for the spark-graft builder (PySpark target).

Thin views over crane_spark.queries.REGISTRY — every implemented
operator registers a (DataFrame builder, DuckDB oracle SQL) pair there.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crane_spark.queries import core as _core  # noqa: E402
import crane_spark.queries  # noqa: E402,F401  (populates the registry)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the 6-table star join (TPC-H Q5 shape) at sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _core.REGISTRY["q5_local_supplier_volume"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _core.queries()


def oracle_sql() -> dict[str, str]:
    return _core.oracle_sql()
