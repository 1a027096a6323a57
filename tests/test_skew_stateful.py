"""Salted skew aggregation, applyInPandasWithState running totals,
foreachBatch upsert sink, IVF-bucketed cosine near-dup."""

from __future__ import annotations

import pyspark.sql.functions as F

from crane_spark.operators.skew import dsum_by, salted_groupby_sum, skewed_key_report
from crane_spark.streaming.pipelines import stream_upsert_parquet
from crane_spark.streaming.stateful import running_totals


def _skewed(spark):
    # 90% of rows share one key — the shape that melts a naive shuffle.
    hot = [("hot", float(i % 7)) for i in range(900)]
    cold = [(f"k{i % 37}", float(i % 5)) for i in range(100)]
    return spark.createDataFrame(hot + cold, "key string, val double").repartition(8)


def test_salted_groupby_equals_direct(spark):
    df = _skewed(spark)
    direct = {r["key"]: (r["value_sum"], r["n_rows"]) for r in dsum_by(df, "key", "val").collect()}
    salted = {
        r["key"]: (r["value_sum"], r["n_rows"])
        for r in salted_groupby_sum(df, "key", "val").collect()
    }
    assert salted == direct
    assert direct["hot"][1] == 900


def test_skewed_key_report_flags_hot_key(spark):
    top = skewed_key_report(_skewed(spark), "key", top=3).collect()
    assert top[0]["key"] == "hot"
    assert top[0]["share"] == 0.9


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """State survives micro-batch boundaries AND query restarts (the
    thing a Crane bolt's per-batch dict can never do)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, "k string, v double").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    out = str(tmp_path / "out")

    def run():
        stream = spark.readStream.schema("k string, v double").option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        q = (
            running_totals(stream, "k", "v")
            .writeStream.foreachBatch(
                lambda b, i: b.withColumn("batch", F.lit(i))
                .write.mode("append")
                .parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def latest_totals():
        rows = spark.read.parquet(out).collect()
        latest = {}
        for r in sorted(rows, key=lambda r: r["batch"]):
            latest[r["key"]] = (r["running_count"], r["running_sum"])
        return latest

    write([("a", 1.0), ("a", 2.0), ("b", 5.0)])
    write([("a", 4.0)])
    run()
    first = latest_totals()
    assert first["a"] == (3, 7.0)  # accumulated across the two batches
    assert first["b"] == (1, 5.0)

    write([("b", 1.0), ("c", 9.0)])
    run()  # restart from checkpoint: prior state recovered, not recounted
    latest = latest_totals()
    assert latest["a"] == (3, 7.0)
    assert latest["b"] == (2, 6.0)
    assert latest["c"] == (1, 9.0)


def test_running_totals_idle_ttl_evicts_and_restarts(spark, tmp_path):
    """Opt-in idle-state eviction: a key idle past idle_ttl_sec is
    emitted once more with is_final=True and its state removed; a
    later arrival restarts from zero. This is the bounded-state mode
    for grow-forever key spaces (doc ids, session ids) — without it
    the state store accretes every key ever seen."""
    import time

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def write(rows):
        spark.createDataFrame(rows, "k string, v double").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def read_rows():
        try:
            return spark.read.parquet(out).collect()
        except Exception:
            return []

    def run(expect):
        # A query with pending processing-time timers keeps scheduling
        # no-data batches, so availableNow need not self-terminate —
        # poll the sink for the expected condition and stop explicitly.
        stream = spark.readStream.schema("k string, v double").parquet(src)
        q = (
            running_totals(stream, "k", "v", idle_ttl_sec=1)
            .writeStream.foreachBatch(
                lambda b, i: b.withColumn("batch", F.lit(i))
                .write.mode("append")
                .parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        deadline = time.time() + 90
        while time.time() < deadline and not expect(read_rows()):
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(60)
        assert expect(read_rows()), "expected output never appeared"

    def finals(rows):
        return {
            (r["key"], r["running_count"], r["running_sum"])
            for r in rows
            if r["is_final"]
        }

    def latest_open(rows):
        latest = {}
        for r in sorted(rows, key=lambda r: r["batch"]):
            if not r["is_final"]:
                latest[r["key"]] = (r["running_count"], r["running_sum"])
        return latest

    write([("a", 1.0), ("a", 2.0)])
    run(lambda rows: latest_open(rows).get("a") == (2, 3.0))
    time.sleep(2.5)  # let the idle TTL lapse in real time
    write([("b", 5.0)])
    # restart: a's pending timer fires -> final row + state removed
    run(lambda rows: ("a", 2, 3.0) in finals(rows) and "b" in latest_open(rows))

    write([("a", 10.0)])
    # evicted key reappears: totals restart from zero, not from (2, 3.0)
    run(lambda rows: latest_open(rows).get("a") == (1, 10.0))
    rows = read_rows()
    assert ("a", 2, 3.0) in finals(rows)
    assert latest_open(rows)["b"] == (1, 5.0)
    # exactly one final row for a's first life
    assert sum(1 for r in rows if r["is_final"] and r["key"] == "a") == 1


def test_foreach_batch_upsert(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, "k string, v double").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        stream = spark.readStream.schema("k string, v double").parquet(src)
        q = stream_upsert_parquet(stream, sink, ckpt, key_cols=["k"])
        q.awaitTermination(120)

    write([("a", 1.0), ("b", 2.0)])
    run()
    assert {(r["k"], r["v"]) for r in spark.read.parquet(sink).collect()} == {
        ("a", 1.0),
        ("b", 2.0),
    }
    write([("b", 9.0), ("c", 3.0)])  # b updated, c inserted
    run()
    assert {(r["k"], r["v"]) for r in spark.read.parquet(sink).collect()} == {
        ("a", 1.0),
        ("b", 9.0),
        ("c", 3.0),
    }


def test_cosine_near_dup_finds_planted_dups(spark):
    """Plant two near-identical vectors; the IVF-bucketed pass must
    pair them (same nearest centroid by construction)."""
    import numpy as np

    from crane_spark.llm.similarity import cosine_near_dup_pairs

    rng = np.random.default_rng(3)
    base = rng.normal(size=(12, 16)).astype(np.float32)
    base[11] = base[10] + rng.normal(scale=0.01, size=16).astype(np.float32)  # near-dup
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(12)],
        "vec_id long, embedding array<float>",
    )
    centroids = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    pairs = cosine_near_dup_pairs(
        df.filter(F.col("vec_id") >= 3), centroids, threshold=0.95
    ).collect()
    assert {(r["vec_a"], r["vec_b"]) for r in pairs} == {(10, 11)}
    assert pairs[0]["cosine"] > 0.99


def test_transform_with_state_running_totals(spark, tmp_path):
    """Spark 4 arbitrary-state API twin of running_totals. The TWS
    protobuf runtime isn't installed here, so this exercises the
    gate; with protobuf present the body matches the
    applyInPandasWithState test above."""
    import pytest

    from crane_spark.streaming.stateful import _has_tws_runtime, running_totals_tws

    src = str(tmp_path / "src")
    spark.createDataFrame([("a", 1.0)], "k string, v double").write.parquet(src)
    stream = spark.readStream.schema("k string, v double").parquet(src)
    if not _has_tws_runtime():
        with pytest.raises(NotImplementedError):
            running_totals_tws(stream, "k", "v")
        # the r7 idle-TTL knob goes through the same gate
        with pytest.raises(NotImplementedError):
            running_totals_tws(stream, "k", "v", idle_ttl_sec=60)
        return
    out = running_totals_tws(stream, "k", "v")
    q = (
        out.writeStream.format("memory").queryName("tws_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["key"]: (r["running_count"], r["running_sum"])
            for r in spark.sql("select * from tws_totals").collect()}
    assert rows["a"] == (1, 1.0)
