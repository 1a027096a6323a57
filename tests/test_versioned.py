"""Versioned dataset snapshots — the DFS-plane analog (SURVEY.md §2.4;
ref dfs/dfs_client.py:101-173, server naming dfs/dfs_server.py:280-288).
"""

from __future__ import annotations

import pytest

from crane_spark.sources import versioned as V


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "store")


def test_put_get_roundtrip_and_version_monotonicity(spark, root):
    df1 = spark.range(5).withColumnRenamed("id", "x")
    df2 = spark.range(9).withColumnRenamed("id", "x")
    assert V.put(df1, root, "nums") == 1
    assert V.put(df2, root, "nums") == 2
    assert V.versions(spark, root, "nums") == [1, 2]
    # latest by default, pinned version on demand (ref `get`)
    assert V.get(spark, root, "nums").count() == 9
    assert V.get(spark, root, "nums", version=1).count() == 5
    # immutability: snapshots are separate directories; v1 unchanged
    assert sorted(r["x"] for r in V.get(spark, root, "nums", 1).collect()) == list(range(5))


def test_get_versions_newest_k(spark, root):
    for n in (3, 4, 5):
        V.put(spark.range(n), root, "d")
    got = V.get_versions(spark, root, "d", 2)
    assert sorted(got) == [2, 3]
    assert got[3].count() == 5


def test_uncommitted_snapshot_is_invisible(spark, root):
    """A version directory without _SUCCESS (crashed put) never counts
    as committed — readers can't observe partial writes."""
    V.put(spark.range(3), root, "d")
    fake = f"{root}/d/v000002"
    spark.range(1).write.parquet(fake)
    fs, path, jvm = V._fs_and_path(spark, fake)
    fs.delete(jvm.org.apache.hadoop.fs.Path(fake + "/_SUCCESS"), False)
    assert V.versions(spark, root, "d") == [1]
    assert V.get(spark, root, "d").count() == 3
    # the next put must neither reuse the torn directory's number
    # (errorifexists would collide and wedge EVERY future put) nor
    # overwrite it (a concurrent writer could be mid-commit): it skips
    # the orphan and commits the next free number.
    assert V.put(spark.range(2), root, "d") == 3
    assert V.versions(spark, root, "d") == [1, 3]
    assert V.get(spark, root, "d").count() == 2
    fs2, path2, _ = V._fs_and_path(spark, fake)
    assert fs2.exists(path2), "orphan dir must be left untouched"


def test_delete_one_version_and_whole_dataset(spark, root):
    for n in (1, 2, 3):
        V.put(spark.range(n), root, "d")
    assert V.delete(spark, root, "d", version=2) == [2]
    assert V.versions(spark, root, "d") == [1, 3]
    assert V.delete(spark, root, "d", version=99) == []
    assert V.delete(spark, root, "d") == [1, 3]
    assert V.versions(spark, root, "d") == []
    with pytest.raises(FileNotFoundError):
        V.get(spark, root, "d")


def test_streaming_snapshot_publisher(spark, tmp_path, root):
    """foreachBatch + versioned.put: each micro-batch publishes the
    refreshed aggregate as a new immutable snapshot — readers always
    see a complete version while the stream keeps appending (the
    streaming analog of the reference's put-then-get workflow)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    src = str(tmp_path / "pub_src")
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )
    spark.createDataFrame([("a", 1), ("b", 2)], schema).write.mode("append").parquet(src)
    spark.createDataFrame([("a", 10)], schema).write.mode("append").parquet(src)

    counts = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .groupBy("k")
        .agg(F.sum("v").alias("total"))
    )

    def publish(batch, _bid):
        V.put(batch, root, "agg")

    q = (
        counts.writeStream.outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "pub_ck"))
        .foreachBatch(publish)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    vs = V.versions(spark, root, "agg")
    assert len(vs) >= 1
    latest = {r["k"]: r["total"] for r in V.get(spark, root, "agg").collect()}
    assert latest == {"a": 11, "b": 2}


def test_incremental_aggregate_maintenance(spark, root):
    """Partial-aggregate mergeability across snapshot versions: the
    aggregate of snapshot v2 equals merge(agg(v1), agg(delta)) — no
    re-scan of v1's rows. The decomposition (sum/count are
    commutative monoids) is what makes incremental materialized
    views correct at 100 TB; snapshots give the immutable inputs."""
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 1)], "k string, v long"
    )
    delta = spark.createDataFrame([("a", 2), ("c", 7)], "k string, v long")
    V.put(base, root, "rows")
    V.put(base.unionByName(delta), root, "rows")

    def agg(df):
        return df.groupBy("k").agg(
            F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
        )

    # merge(agg(v1), agg(delta)): re-aggregate the partials
    merged = (
        agg(V.get(spark, root, "rows", version=1))
        .unionByName(agg(delta))
        .groupBy("k")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
    )
    full = agg(V.get(spark, root, "rows", version=2))
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_snapshot_diff(spark, root):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b"), (3, "c")], "id long, s string"
    )
    nxt = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "CHANGED"), (4, "d")], "id long, s string"
    )
    V.put(base, root, "t")
    V.put(nxt, root, "t")
    got = {
        (r["id"], r["s"], r["change"]) for r in V.diff(spark, root, "t", 1, 2).collect()
    }
    assert got == {
        (3, "CHANGED", "added"),
        (4, "d", "added"),
        (2, "b", "removed"),   # multiset: one of the two dup rows went away
        (3, "c", "removed"),
    }


def test_compaction_rewrites_small_files_content_identical(spark, root):
    """OPTIMIZE analog: a snapshot written as many tiny files compacts
    into a new version with few files and a byte-identical row
    multiset; the original version stays readable (immutability)."""
    df = spark.range(10_000).withColumnRenamed("id", "x")
    V.put(df.repartition(64), root, "d")  # 64 tiny files
    new_v, before, after = V.compact(spark, root, "d", target_bytes=1 << 30)
    assert new_v == 2 and before == 64 and after == 1
    fs, path, jvm = V._fs_and_path(spark, f"{root}/d/v{new_v:06d}")
    data_files = [
        s for s in fs.listStatus(path) if not s.getPath().getName().startswith("_")
    ]
    assert len(data_files) == 1
    # content-identical multiset, original untouched
    assert V.get(spark, root, "d", 2).exceptAll(V.get(spark, root, "d", 1)).count() == 0
    assert V.get(spark, root, "d", 1).exceptAll(V.get(spark, root, "d", 2)).count() == 0
    assert V.versions(spark, root, "d") == [1, 2]
    # a mid-range target bin-packs to ceil(total/target) files
    sz = sum(
        s.getLen()
        for s in V._fs_and_path(spark, f"{root}/d/v000001")[0].listStatus(
            V._fs_and_path(spark, f"{root}/d/v000001")[1]
        )
        if not s.getPath().getName().startswith("_")
    )
    v3, _, n3 = V.compact(spark, root, "d", version=1, target_bytes=max(1, sz // 4))
    assert v3 == 3 and 4 <= n3 <= 5
    assert V.get(spark, root, "d", 3).count() == 10_000


def test_expire_keeps_newest_versions(spark, root):
    for n in (1, 2, 3, 4, 5):
        V.put(spark.range(n), root, "d")
    assert V.expire(spark, root, "d", keep_last=2) == [1, 2, 3]
    assert V.versions(spark, root, "d") == [4, 5]
    assert V.get(spark, root, "d").count() == 5
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        V.get(spark, root, "d", version=2)


def test_incremental_join_maintenance_equals_full_rejoin(spark):
    """Delta-join maintenance must reproduce the full re-join EXACTLY
    (multiset) when both sides gain and lose rows, including duplicate
    rows on both sides."""
    import random

    from crane_spark.operators.incremental import incremental_join

    rng = random.Random(11)
    a_rows = [(rng.randrange(12), rng.randrange(5)) for _ in range(60)]
    b_rows = [(rng.randrange(12), rng.randrange(7) + 100) for _ in range(40)]
    a_old = spark.createDataFrame(a_rows, "k long, av long")
    b_old = spark.createDataFrame(b_rows, "k long, bv long")
    # updates touching both sides: deletions (sampled) + additions
    a_new_rows = [r for r in a_rows if rng.random() > 0.2] + [
        (rng.randrange(12), rng.randrange(5) + 50) for _ in range(10)
    ]
    b_new_rows = [r for r in b_rows if rng.random() > 0.2] + [
        (rng.randrange(12), rng.randrange(7) + 200) for _ in range(8)
    ]
    a_new = spark.createDataFrame(a_new_rows, "k long, av long")
    b_new = spark.createDataFrame(b_new_rows, "k long, bv long")

    view_old = a_old.join(b_old, ["k"])
    maintained = incremental_join(view_old, a_old, a_new, b_old, b_new, ["k"])
    full = a_new.join(b_new, ["k"])
    assert maintained.exceptAll(full).count() == 0
    assert full.exceptAll(maintained).count() == 0
    assert full.count() > 0


def test_incremental_join_with_precomputed_deltas(spark):
    """The CDC-shaped entry point: callers holding row deltas skip the
    four snapshot scans and must reproduce the full re-join exactly —
    and the view is subtracted ONCE (the two delete terms union into a
    single exceptAll)."""
    import random

    from crane_spark.operators.incremental import (
        deltas,
        incremental_join_with_deltas,
    )

    rng = random.Random(23)
    a_rows = [(rng.randrange(9), rng.randrange(4)) for _ in range(50)]
    b_rows = [(rng.randrange(9), rng.randrange(6) + 100) for _ in range(30)]
    a_old = spark.createDataFrame(a_rows, "k long, av long")
    b_old = spark.createDataFrame(b_rows, "k long, bv long")
    a_new = spark.createDataFrame(
        [r for r in a_rows if rng.random() > 0.3]
        + [(rng.randrange(9), 77) for _ in range(6)],
        "k long, av long",
    )
    b_new = spark.createDataFrame(
        [r for r in b_rows if rng.random() > 0.3]
        + [(rng.randrange(9), 277) for _ in range(5)],
        "k long, bv long",
    )
    da_add, da_del = deltas(a_old, a_new)
    db_add, db_del = deltas(b_old, b_new)
    maintained = incremental_join_with_deltas(
        a_old.join(b_old, ["k"]), a_old, b_old, b_new, ["k"],
        da_add, da_del, db_add, db_del,
    )
    full = a_new.join(b_new, ["k"])
    assert maintained.exceptAll(full).count() == 0
    assert full.exceptAll(maintained).count() == 0


def test_get_versions_zero_and_negative_return_nothing(spark, root):
    """vs[-0:] slices the WHOLE list — num_versions<=0 must mean none,
    not an accidental full-history read."""
    for n in (1, 2, 3):
        V.put(spark.range(n), root, "d")
    assert V.get_versions(spark, root, "d", 0) == {}
    assert V.get_versions(spark, root, "d", -2) == {}
    assert sorted(V.get_versions(spark, root, "d", 2)) == [2, 3]


def test_diff_by_key_reports_value_updates(spark, root):
    """With key_cols, a key whose NON-KEY values changed must surface
    as 'updated' — projecting to keys first would report an
    update-heavy release as zero changes."""
    v1 = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "id long, score long")
    v2 = spark.createDataFrame([(1, 99), (2, 20), (4, 40)], "id long, score long")
    V.put(v1, root, "t")
    V.put(v2, root, "t")
    got = {
        (r["id"], r["change"])
        for r in V.diff(spark, root, "t", 1, 2, key_cols=["id"]).collect()
    }
    assert got == {(1, "updated"), (3, "removed"), (4, "added")}


def test_diff_by_key_multiplicity_change_is_updated(spark, root):
    """A key whose row is duplicated in one version and not the other
    exists in BOTH versions — it must classify as 'updated', never
    'removed'/'added' (ADVICE r7: classifying from the changed-row
    multisets mislabeled this case)."""
    v1 = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 20)], "id long, score long"
    )
    v2 = spark.createDataFrame([(1, 10), (2, 20)], "id long, score long")
    V.put(v1, root, "m")
    V.put(v2, root, "m")
    got = {
        (r["id"], r["change"])
        for r in V.diff(spark, root, "m", 1, 2, key_cols=["id"]).collect()
    }
    assert got == {(1, "updated")}
