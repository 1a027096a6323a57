"""Vectorized Python UDF surface (SURVEY.md §2.2 'UDF/UDAF/UDTF').

The reference's Bolt is arbitrary per-batch Python over a batch
iterator (util.py:4-10); the faithful Spark mapping is Arrow-batched
pandas execution — mapInPandas (per-partition batch iterator, like a
bolt without keys) and applyInPandas (keyed batch, like a
fields-grouped bolt). Row-at-a-time @udf is deliberately absent from
the registry: it is never the right tool on the hot path.

Where the pandas arithmetic is exact (integer sums), the query keeps a
full DuckDB oracle; the float-matmul top-k keeps a rows-only contract
(BLAS summation order differs from sequential) and is unit-tested for
rank-equality against the JVM implementation instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crane_spark.queries.core import register
from crane_spark.tables import fan_out, table

PANDAS_STATS_SQL = """
SELECT lang,
       count(*) AS n_docs,
       SUM(n_chars) AS total_chars,
       SUM(len(string_split(text, ' '))) AS total_tokens,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
FROM documents
GROUP BY lang
"""


@register("pandas_grouped_stats", PANDAS_STATS_SQL, tags=("llm", "udf", "pandas"))
def q_pandas_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas (grouped map): per-language doc statistics
    computed inside pandas. Integer sums are exact, so this pandas path
    still hash-matches the SQL oracle."""
    docs = table(spark, sf_dir, "documents")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        n_tokens = pdf["text"].str.split(" ").map(len)
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [len(pdf)],
                "total_chars": [int(pdf["n_chars"].sum())],
                "total_tokens": [int(n_tokens.sum())],
                "avg_chars": [float(pdf["n_chars"].sum()) / len(pdf)],
            }
        )

    return docs.groupBy("lang").applyInPandas(
        stats,
        schema="lang string, n_docs long, total_chars long, total_tokens long, avg_chars double",
    )


@register("pandas_topk_cosine", None, tags=("llm", "udf", "pandas", "similarity"))
def q_pandas_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas ANN: the query block is shipped to every partition
    as a NumPy matrix; each Arrow batch of candidates computes a
    (batch x queries) cosine matmul and emits scored pairs, ranked by a
    window afterward. This is the scatter-gather pattern for 100 TB
    similarity search when the query set is small. Rows-only contract:
    BLAS accumulation order makes the last float ulp engine-specific
    (rank-equality vs the JVM implementation is unit-tested)."""
    import numpy as np

    emb = table(spark, sf_dir, "embeddings")
    qrows = emb.filter(F.col("vec_id") < 5).select("vec_id", "embedding").collect()
    q_ids = np.array([r["vec_id"] for r in qrows])
    q_mat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            c_mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            c_norm = np.linalg.norm(c_mat, axis=1)
            sims = (c_mat @ q_mat.T) / (c_norm[:, None] * q_norm[None, :])
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, len(pdf)),
                    "neighbor_id": np.tile(pdf["vec_id"].to_numpy(), len(q_ids)),
                    "cosine": np.round(sims.T.reshape(-1), 4),
                }
            )
            yield out[out["query_id"] != out["neighbor_id"]]

    scored = fan_out(emb).select("vec_id", "embedding").mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
    )


APPROX_SQL = None  # approx sketches are engine-specific: rows-only


@register("approx_distinct_customers", APPROX_SQL, tags=("agg", "approx"))
def q_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct (engine-specific sketch ->
    rows-only contract; the exact twin is `distinct_counts`)."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )
