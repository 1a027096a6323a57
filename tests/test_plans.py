"""Physical-plan assertions: the scale properties SURVEY.md §2.2 and
the build brief demand — predicate pushdown into the parquet scan,
column pruning, broadcast joins for dimensions, top-k without a global
sort. These guard against regressions that correctness tests can't see
(a plan that reads every column still returns the right answer)."""

from __future__ import annotations

from crane_spark.queries import REGISTRY


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_q6_pushes_filters_and_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q6_revenue_forecast")
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan
    # Column pruning: the 11-column lineitem scan reads only what q6 needs.
    read_schema = next(line for line in plan.splitlines() if "ReadSchema" in line)
    assert "l_extendedprice" in read_schema and "l_returnflag" not in read_schema


def test_q5_broadcasts_every_dimension(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_topk_avoids_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "topk_orders")
    assert "TakeOrderedAndProject" in plan  # per-partition heaps, k-row merge


def test_wordcount_partial_aggregates(spark, sf_dir):
    plan = _plan(spark, sf_dir, "wordcount")
    assert plan.count("HashAggregate") >= 2  # partial + final split


def test_semi_join_stays_semi(spark, sf_dir):
    plan = _plan(spark, sf_dir, "semi_join_big_spenders")
    assert "LeftSemi" in plan
