"""AQE skew-join handling: with the skew thresholds lowered to local
scale, a join against a 90%-hot-key build side gets its skewed
partition split at runtime (visible in the final adaptive plan)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_aqe_splits_skewed_join(spark):
    conf_keys = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in conf_keys}
    for k, v in conf_keys.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 1000).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
        )
        joined = left.join(right, "k")
        # execute THIS DataFrame's plan (count() would build a separate
        # query execution and the explained plan would never finalize)
        n = len(joined.collect())
        assert n == 200_000
        final_plan = joined._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            joined._jdf.queryExecution(), "simple"
        )
        assert "isFinalPlan=true" in final_plan
        assert "AQEShuffleRead" in final_plan
        # the hot partition (key 7 carries ~90% of rows) was split
        assert "skew=true" in final_plan or "isSkew=true" in final_plan
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
