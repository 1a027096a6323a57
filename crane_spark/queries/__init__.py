"""The declared query surface (SURVEY.md §2.2 contract).

Importing this package populates REGISTRY: every query is a named pair
(DataFrame builder, DuckDB oracle SQL). The driver contract functions
in __spark_entry__.py are thin views over this registry.
"""

from crane_spark.queries.core import REGISTRY, QuerySpec, oracle_sql, queries, register

# Side-effect imports: each module registers its queries.
from crane_spark.queries import reference  # noqa: F401
from crane_spark.queries import relational  # noqa: F401
from crane_spark.queries import relational2  # noqa: F401
from crane_spark.queries import corpus  # noqa: F401
from crane_spark.queries import corpus2  # noqa: F401
from crane_spark.queries import events  # noqa: F401
from crane_spark.queries import iterative  # noqa: F401
from crane_spark.queries import llm  # noqa: F401
from crane_spark.queries import stats  # noqa: F401
from crane_spark.queries import tpch_more  # noqa: F401
from crane_spark.queries import tpch3  # noqa: F401
from crane_spark.queries import tpch4  # noqa: F401
from crane_spark.queries import pipeline  # noqa: F401
from crane_spark.queries import udf  # noqa: F401
from crane_spark.queries import search  # noqa: F401
from crane_spark.queries import mixture  # noqa: F401
from crane_spark.queries import sql4  # noqa: F401
from crane_spark.queries import analytics  # noqa: F401
from crane_spark.queries import analytics2  # noqa: F401
from crane_spark.queries import sketch_diff  # noqa: F401
from crane_spark.queries import layout  # noqa: F401

__all__ = ["REGISTRY", "QuerySpec", "register", "queries", "oracle_sql"]
