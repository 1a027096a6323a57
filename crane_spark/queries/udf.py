"""Vectorized Python UDF surface (SURVEY.md §2.2 'UDF/UDAF/UDTF').

The reference's Bolt is arbitrary per-batch Python over a batch
iterator (util.py:4-10); the faithful Spark mapping is Arrow-batched
pandas execution — mapInPandas (per-partition batch iterator, like a
bolt without keys) and applyInPandas (keyed batch, like a
fields-grouped bolt). Row-at-a-time @udf is deliberately absent from
the registry: it is never the right tool on the hot path.

Where the pandas arithmetic is exact (integer sums), the query keeps a
full DuckDB oracle; the float-matmul top-k ranks on 4-decimal ROUNDED
cosines with an id tiebreak, which collapses the BLAS-vs-sequential
summation ULPs and lets it share `embedding_topk`'s verified oracle
(r7); raw rank-equality against the JVM implementation stays
unit-tested besides.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crane_spark.queries.core import register
from crane_spark.queries.llm import TOPK_SQL as PANDAS_TOPK_SQL
from crane_spark.tables import table

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


@register("pandas_topk_cosine", PANDAS_TOPK_SQL, tags=("llm", "udf", "pandas", "similarity"))
def q_pandas_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas ANN: the query block is shipped to every partition
    as a NumPy matrix; each Arrow batch of candidates computes a
    (batch x queries) cosine matmul and emits scored pairs, ranked by a
    window afterward. This is the scatter-gather pattern for 100 TB
    similarity search when the query set is small.

    Oracle-checked since r7 (verdict #5): BLAS accumulation order
    makes the last float ULP engine-specific, but the ranking (and the
    emitted cosine) runs on the 4-decimal ROUNDED value with a
    neighbor_id tiebreak — exactly `embedding_topk`'s already-verified
    discipline — so the hash matches unless a cosine sits within an
    ulp of a 0.00005 rounding boundary (same accepted residual as
    every rounded-double query here; np.round's half-even vs round()'s
    half-away differs only AT the boundary, which the 1e-9-ish cosine
    grid never produces). The oracle is `embedding_topk`'s all-pairs
    definition verbatim."""
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

    # No fan_out: Python parallelism should track DATA volume, not the
    # core count — 32 workers on a small block means ~60-row Arrow
    # batches and worker-spawn dominating the matmul. Scan splits give
    # the parallelism at production scale; locally one fat batch per
    # split is the fast shape.
    scored = emb.select("vec_id", "embedding").mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
    )


# r7 (verdict #5): converted from rows-only to the DIFFERENTIAL shape
# the sketch_diff family proved — the entry still runs the HLL++
# sketch (the operator under test), but its OUTPUT is the exact
# distinct count plus a within_bound flag, both of which hash against
# DuckDB. The flag is deterministic per dataset (fixed hash seeds) and
# the bound (2.5 sigma at rsd=0.02) holds at every rung the sweep
# runs, so the driver's hash comparison itself now asserts the sketch
# tracked the exact answer.
APPROX_SQL = """
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS exact_customers,
       count(*) AS n_orders,
       TRUE AS within_bound
FROM orders GROUP BY o_orderstatus
"""

APPROX_DISTINCT_REL_BOUND = 0.05  # 2.5 x rsd


@register("approx_distinct_customers", APPROX_SQL, tags=("agg", "approx", "differential"))
def q_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct, oracle-checked in the
    differential shape (r7): one aggregate computes the sketch AND the
    exact distinct per status; the hash verifies the exact value and
    pins `within_bound` (|approx - exact| <= 5% of exact, 2.5x the
    requested rsd) to TRUE. The pure-sketch serving shape (no exact
    twin in the plan) is what a 100 TB dashboard runs; this entry is
    its qualification harness, like the hll_rollup_diff family."""
    orders = table(spark, sf_dir, "orders")
    # Pre-group by (status, custkey) instead of mixing COUNT(DISTINCT)
    # with plain aggregates in one GROUP BY: the mixed form plans an
    # Expand (every row duplicated per aggregate group) plus a 4-phase
    # aggregate — measured 1.4 s vs 0.5+0.4 s for the parts at sf0.1
    # (r10, guide §2.2). Over the pre-grouped keys, COUNT(*) IS the
    # exact distinct, SUM of per-key counts IS n_orders, and the HLL
    # sketch is BIT-IDENTICAL because HyperLogLog registers are
    # duplicate-insensitive (max over hashes — the same max whether a
    # key appears once or a thousand times). One map-side-combinable
    # hash aggregate, no Expand: 1.5 -> 0.47 s, values identical.
    # NON-NULL PRECONDITION (ADVICE r10): COUNT(*) over pre-grouped
    # keys counts a NULL custkey group, while COUNT(DISTINCT) and
    # approx_count_distinct ignore NULLs — the rewrite is equivalent
    # only because o_custkey is a non-null TPC-H column. Filter NULL
    # keys before the pre-group if this pattern is lifted to a
    # nullable column (same caveat at sketch_diff.py's hll_rollup).
    per_key = orders.groupBy("o_orderstatus", "o_custkey").agg(
        F.count(F.lit(1)).alias("_c")
    )
    n_keys = F.count(F.lit(1))
    return per_key.groupBy("o_orderstatus").agg(
        n_keys.alias("exact_customers"),
        F.sum("_c").alias("n_orders"),
        (
            F.abs(F.approx_count_distinct("o_custkey", rsd=0.02) - n_keys)
            <= F.lit(APPROX_DISTINCT_REL_BOUND) * n_keys
        ).alias("within_bound"),
    )


READABILITY_SQL = """
WITH m AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS t,
         (2068350 - 10150 * len(string_split(text, ' ')))
           * len(string_split(text, ' ')) - 846000 * n_chars AS n
  FROM documents
)
SELECT doc_id,
       CAST(CASE WHEN n >= 0 THEN (2 * n + t) // (2 * t)
                 ELSE -((2 * (-n) + t) // (2 * t)) END AS DOUBLE) / 10000
         AS readability
FROM m
"""


@register("pandas_readability", READABILITY_SQL, tags=("llm", "udf", "pandas"))
def q_pandas_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized SCALAR pandas_udf (Arrow-batched, whole-column numpy
    arithmetic per batch) — the Flesch-like readability shape,
    206.835 - 1.015*t - 84.6*(chars/t), reported at 4 dp.

    The UDF computes the EXACT integer numerator of the score scaled
    by 10^4*t (pure int64 numpy ops — no float enters Python at all);
    the 4-dp value is then recovered JVM-side with integer
    round-half-away division. A plain `round(double, 4)` here is a
    trap: the score grid genuinely lands on .xxxx5 ties (first hits at
    sf0.1), where Spark rounds the shortest decimal representation
    and DuckDB the binary value — integer tie-breaking is the only
    representation both engines share. Demonstrates the scalar tier
    of the UDF surface; mapInPandas / applyInPandas cover the
    batch-iterator tiers."""
    docs = table(spark, sf_dir, "documents")

    @F.pandas_udf("long")
    def readability_n(n_tokens: pd.Series, n_chars: pd.Series) -> pd.Series:
        t = n_tokens.astype("int64")
        return (2068350 - 10150 * t) * t - 846000 * n_chars.astype("int64")

    n_tokens = F.size(F.split(F.col("text"), " "))
    scored = docs.select(
        "doc_id",
        n_tokens.alias("t"),
        readability_n(n_tokens, F.col("n_chars")).alias("n"),
    )
    rounded = F.when(
        F.col("n") >= 0, F.expr("(2 * n + t) div (2 * t)")
    ).otherwise(-F.expr("(2 * (-n) + t) div (2 * t)"))
    return scored.select(
        "doc_id",
        (rounded.cast("double") / F.lit(10000.0)).alias("readability"),
    )


PANDAS_MEDIAN_SQL = """
SELECT o_orderstatus, median(o_totalprice) AS median_price, count(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
"""


@register("pandas_median_udaf", PANDAS_MEDIAN_SQL, tags=("udf", "pandas", "agg"))
def q_pandas_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas_udf (vectorized UDAF): numpy median per
    group. np.median and DuckDB's median both linearly interpolate the
    middle of the sorted values (type-7), so the result hash-matches.
    Each group's values stream to one Arrow batch — the UDAF analog of
    a fields-grouped aggregating bolt."""
    import numpy as np

    orders = table(spark, sf_dir, "orders")

    @F.pandas_udf("double")
    def pd_median(v: pd.Series) -> float:
        return float(np.median(v.to_numpy()))

    @F.pandas_udf("long")
    def pd_count(v: pd.Series) -> int:
        # Spark disallows mixing GROUPED_AGG pandas UDFs with built-in
        # aggregates in one agg(), so the count is a pandas UDAF too.
        return int(len(v))

    return orders.groupBy("o_orderstatus").agg(
        pd_median("o_totalprice").alias("median_price"),
        pd_count("o_totalprice").alias("n_orders"),
    )
