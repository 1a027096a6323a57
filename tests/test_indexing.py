"""operators/indexing.py — dense order-preserving indexing without
single-partition sorts: bijection, order, determinism, and the plan
property (no unpartitioned Window Exchange over data rows)."""

from __future__ import annotations

import pyspark.sql.functions as F

from crane_spark.operators.indexing import dense_index


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_dense_index_is_bijection_zero_based(spark):
    df = spark.range(1000).select((F.col("id") * 7 + 3).alias("vec_id"))
    out = dense_index(df, tiebreak="vec_id").collect()
    ixs = sorted(r["_ix"] for r in out)
    assert ixs == list(range(1000))
    # deterministic: a second build assigns identical indexes
    again = {r["vec_id"]: r["_ix"] for r in dense_index(df, "vec_id").collect()}
    assert all(again[r["vec_id"]] == r["_ix"] for r in out)


def test_dense_index_major_order_preserved_one_based(spark):
    """With a major column the index must be dense 1..n and NEVER
    invert the major order: every row of a smaller dfreq ranks before
    every row of a larger dfreq (the PPJoin rarity contract)."""
    rows = [(f"tok{i}", 1 + (i % 17)) for i in range(3000)]
    df = spark.createDataFrame(rows, "token string, dfreq long")
    out = dense_index(
        df, tiebreak="token", major="dfreq", out="rank", one_based=True
    ).collect()
    ranks = sorted(r["rank"] for r in out)
    assert ranks == list(range(1, 3001))
    by_rank = sorted(out, key=lambda r: r["rank"])
    dfreqs = [r["dfreq"] for r in by_rank]
    assert dfreqs == sorted(dfreqs)


def test_dense_index_window_fallback_matches_collect_path(spark):
    """Forcing the post-aggregate window fallback (major_cap=0) must
    produce the identical index as the driver-side cumsum path."""
    rows = [(f"t{i}", 1 + (i % 5)) for i in range(400)]
    df = spark.createDataFrame(rows, "token string, dfreq long")
    a = {
        r["token"]: r["rank"]
        for r in dense_index(df, "token", major="dfreq", out="rank").collect()
    }
    b = {
        r["token"]: r["rank"]
        for r in dense_index(
            df, "token", major="dfreq", out="rank", major_cap=0
        ).collect()
    }
    assert a == b


def test_dense_index_empty_and_small(spark):
    empty = spark.createDataFrame([], "vec_id long")
    assert dense_index(empty, "vec_id").count() == 0
    one = spark.createDataFrame([(42,)], "vec_id long")
    assert dense_index(one, "vec_id").collect()[0]["_ix"] == 0


def test_dense_index_plan_has_no_unpartitioned_window(spark):
    """The entire point: no Window over an empty partition spec (which
    plans as Exchange SinglePartition over the data). The only
    SinglePartition exchanges permitted anywhere in the plan are over
    aggregate outputs — with the default major_cap those don't appear
    at all because offsets collect driver-side."""
    df = spark.range(5000).select((F.col("id") * 3).alias("vec_id"))
    plan = _plan(dense_index(df, "vec_id"))
    assert "Exchange SinglePartition" not in plan

    vocab = spark.range(5000).select(
        F.concat(F.lit("t"), F.col("id")).alias("token"),
        (F.col("id") % 13 + 1).alias("dfreq"),
    )
    plan2 = _plan(dense_index(vocab, "token", major="dfreq", out="rank"))
    assert "Exchange SinglePartition" not in plan2


def test_dense_index_empty_input_both_regimes(spark):
    """Zero-row inputs (an empty corpus slice, a filtered-out
    vocabulary) must yield an empty indexed frame with the expected
    column, not a driver error in the offset construction — both the
    no-major and the major (driver-cumsum) paths."""
    from crane_spark.operators.indexing import dense_index

    empty = spark.createDataFrame([], "token string, dfreq long")
    plain = dense_index(empty, tiebreak="token", out="rank", one_based=True)
    assert plain.count() == 0 and "rank" in plain.columns
    major = dense_index(
        empty, tiebreak="token", major="dfreq", out="rank", one_based=True
    )
    assert major.count() == 0 and "rank" in major.columns
