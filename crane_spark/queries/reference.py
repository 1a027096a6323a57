"""Reference-parity queries: the three Crane topologies re-expressed
over the test tables (SURVEY.md §2.1 ops A-K).

The reference runs these over ad-hoc text/CSV files; here the same
dataflow shapes run over the star schema so the DuckDB oracle can
verify them end-to-end:

* wordcount            — documents.text stands in for the spout file
* user_filter_count    — events.value > 50 stands in for the CSV int field
* pagerank_contrib     — lineitem (l_orderkey -> l_partkey) as the edge list
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crane_spark.operators.topology import (
    global_filter_count,
    pagerank_contributions,
    wordcount,
)
from crane_spark.queries.core import register
from crane_spark.tables import table

WORDCOUNT_SQL = """
SELECT token, count(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
"""


@register("wordcount", WORDCOUNT_SQL, tags=("reference", "flatmap", "agg"))
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ops C+D+J: tokenize -> per-key count (ref word_count_topology.py)."""
    docs = table(spark, sf_dir, "documents").select(F.col("text").alias("value"))
    return wordcount(docs)


USER_FILTER_SQL = "SELECT count(*) AS result_count FROM events WHERE value > 50"


@register("user_filter_count", USER_FILTER_SQL, tags=("reference", "filter", "agg"))
def q_user_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ops E+F: numeric filter > 50, global count
    (ref twitter_user_filter_topology.py:14 — including the boundary
    case where the filter selects zero rows)."""
    ev = table(spark, sf_dir, "events")
    return global_filter_count(ev, F.col("value") > 50)


PAGERANK_SQL = """
WITH deg AS (
  SELECT l_orderkey, count(*) AS outdegree FROM lineitem GROUP BY l_orderkey
)
SELECT l_partkey AS url,
       CAST(SUM(CAST(CAST(1.0 AS DOUBLE) / (outdegree + 1) AS DECIMAL(28,12))) AS DOUBLE) AS rank
FROM lineitem JOIN deg USING (l_orderkey)
GROUP BY l_partkey
"""


@register("pagerank_contrib", PAGERANK_SQL, tags=("reference", "join", "agg"))
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ops G+H: one contribution round, 1/(outdegree+1) per edge
    (ref page_rank_topology.py:14-17), edges = lineitem order->part."""
    edges = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("src"), F.col("l_partkey").alias("dst")
    )
    return pagerank_contributions(edges)
