"""Lifecycle contract of operators.caching.release_local_checkpoint:
iterative loops (BPE rounds, NN-Descent rounds) must be able to free
a superseded round's executor-storage copy deterministically instead
of waiting for a driver GC cycle (ADVICE r3)."""

import pytest


def _persistent_ids(spark):
    m = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = m.keysIterator()
    out = set()
    while it.hasNext():
        out.add(it.next())
    return out


def test_release_frees_checkpoint_storage(spark):
    from crane_spark.operators.caching import release_local_checkpoint

    before = _persistent_ids(spark)
    st = spark.range(1000).selectExpr("id", "id * 2 AS y").localCheckpoint(
        eager=True
    )
    created = _persistent_ids(spark) - before
    assert created, "eager localCheckpoint should persist an RDD"
    release_local_checkpoint(st)
    assert not (_persistent_ids(spark) & created), "storage must be freed NOW"


def test_release_works_for_lazy_checkpoint_after_materialization(spark):
    from crane_spark.operators.caching import release_local_checkpoint

    before = _persistent_ids(spark)
    st = spark.range(1000).selectExpr("id").localCheckpoint(eager=False)
    assert st.count() == 1000  # materializes the checkpoint
    created = _persistent_ids(spark) - before
    assert created
    release_local_checkpoint(st)
    assert not (_persistent_ids(spark) & created)


def test_release_rejects_non_checkpointed_frames(spark):
    from crane_spark.operators.caching import release_local_checkpoint

    df = spark.range(10).selectExpr("id * 2 AS y")
    with pytest.raises(TypeError, match="LogicalRDD"):
        release_local_checkpoint(df)


def test_release_raises_documented_error_when_accessors_missing(spark):
    """ADVICE r5: a runtime without the private JVM accessors (Spark
    Connect, changed internals) must get the documented RuntimeError,
    not a bare AttributeError."""
    import pytest

    from crane_spark.operators.caching import release_local_checkpoint

    class FakeFrame:
        pass  # no _jdf at all — the Connect shape

    with pytest.raises(RuntimeError, match="ContextCleaner"):
        release_local_checkpoint(FakeFrame())
