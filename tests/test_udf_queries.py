"""Rows-only queries get their strong checks here: the pandas ANN path
must rank-match the JVM implementation; the HLL sketch must be within
its error bound of the exact count."""

from __future__ import annotations

from crane_spark.queries import REGISTRY


def test_pandas_topk_ranks_match_jvm(spark, sf_dir):
    jvm = REGISTRY["embedding_topk"].fn(spark, sf_dir).collect()
    pdk = REGISTRY["pandas_topk_cosine"].fn(spark, sf_dir).collect()
    jvm_ranked = {(r["query_id"], r["rn"]): r["neighbor_id"] for r in jvm}
    pd_ranked = {(r["query_id"], r["rn"]): r["neighbor_id"] for r in pdk}
    assert jvm_ranked == pd_ranked


def test_python_udtf(spark):
    """Spark 4 Python UDTF surface: one input row -> many typed output
    rows (the reference's SplitBolt as a user-defined table function)."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="word: string, length: int")
    class SplitWords:
        def eval(self, text: str):
            for w in text.split(" "):
                yield (w, len(w))

    spark.udtf.register("split_words", SplitWords)
    rows = spark.sql(
        "SELECT * FROM split_words('the quick brown fox')"
    ).collect()
    assert [(r["word"], r["length"]) for r in rows] == [
        ("the", 3),
        ("quick", 5),
        ("brown", 5),
        ("fox", 3),
    ]
    # lateral-join form over a table
    spark.createDataFrame([("a bb",), ("ccc",)], "t string").createOrReplaceTempView("tt")
    n = spark.sql(
        "SELECT word FROM tt, LATERAL split_words(t)"
    ).count()
    assert n == 3


def test_approx_distinct_within_rsd(spark, sf_dir):
    exact = {
        r["o_orderstatus"]: r["n_customers"]
        for r in REGISTRY["distinct_counts"].fn(spark, sf_dir).collect()
    }
    approx = {
        r["o_orderstatus"]: r["approx_customers"]
        for r in REGISTRY["approx_distinct_customers"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for status, n in exact.items():
        assert abs(approx[status] - n) <= max(3, 0.1 * n), status
