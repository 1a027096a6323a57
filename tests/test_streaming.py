"""Structured Streaming: batch/stream parity, watermark late-data
drop, exactly-once checkpoint resume, streaming dedup, stream-static
join. Replaces the reference's replay/ack machinery (SURVEY.md §2.1
op L) with something strictly stronger — and these tests are the proof.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from crane_spark.operators.topology import wordcount
from crane_spark.sources import read_text_lines
from crane_spark.streaming import (
    run_available_now,
    stream_dedup_with_watermark,
    stream_static_enrich,
    stream_to_parquet,
    stream_wordcount,
    windowed_event_stats,
)

EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _write_events(spark, path, rows):
    from datetime import datetime

    rows = [
        (eid, datetime.fromisoformat(ts), uid, etype, val)
        for eid, ts, uid, etype, val in rows
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_stream_wordcount_equals_batch(spark, tmp_path):
    src = tmp_path / "txt"
    src.mkdir()
    (src / "a.txt").write_text("x y x\nz\n")
    (src / "b.txt").write_text("x z z\n")
    batch = {
        r["token"]: r["cnt"]
        for r in wordcount(read_text_lines(spark, str(src))).collect()
    }
    stream = stream_wordcount(read_text_lines(spark, str(src), streaming=True))
    run_available_now(stream, "wc_sink", output_mode="complete")
    got = {r["token"]: r["cnt"] for r in spark.table("wc_sink").collect()}
    assert got == batch == {"x": 3, "y": 1, "z": 3}


def test_windowed_stats_watermark_and_exactly_once(spark, tmp_path):
    """Two availableNow runs over one checkpoint:

    run 1: events up to 06:30 -> watermark passes, the 01:00 window is
           finalized into the sink exactly once.
    run 2 (same checkpoint): one new on-time row plus one LATE row
           (01:15, far below the persisted watermark) -> the late row
           is dropped and previously-emitted windows do not re-emit.
    """
    src = str(tmp_path / "events")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema(EVENT_SCHEMA).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        q = stream_to_parquet(
            windowed_event_stats(stream, window="1 hour", watermark="1 hour"),
            sink,
            ckpt,
        )
        q.awaitTermination(120)

    _write_events(
        spark,
        src,
        [
            (1, "2024-01-01 01:10:00", 1, "click", 1.0),
            (2, "2024-01-01 01:40:00", 1, "click", 2.0),
        ],
    )
    _write_events(spark, src, [(3, "2024-01-01 06:30:00", 2, "view", 5.0)])
    run()
    first = spark.read.parquet(sink).collect()
    finalized = {(str(r["window_start"]), r["event_type"]): r["n_events"] for r in first}
    assert finalized[("2024-01-01 01:00:00", "click")] == 2  # window complete, once

    _write_events(
        spark,
        src,
        [
            (4, "2024-01-01 07:30:00", 2, "view", 1.0),  # on time
            (5, "2024-01-01 01:15:00", 1, "click", 9.0),  # LATE: below watermark
        ],
    )
    run()
    after = spark.read.parquet(sink).collect()
    clicks_0100 = [
        r
        for r in after
        if str(r["window_start"]) == "2024-01-01 01:00:00" and r["event_type"] == "click"
    ]
    assert len(clicks_0100) == 1  # not re-emitted, late row dropped
    assert clicks_0100[0]["n_events"] == 2  # late row really is gone


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """session_window under readStream (with watermark) produces the
    same sessions the batch session query computes."""
    import pyspark.sql.functions as SF

    src = str(tmp_path / "events")
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click", 1.0),
        (2, "2024-01-01 10:02:00", 1, "click", 1.0),  # same session (2 min gap)
        (3, "2024-01-01 10:30:00", 1, "click", 1.0),  # new session (28 min gap)
        (4, "2024-01-01 10:01:00", 2, "view", 1.0),
    ]
    _write_events(spark, src, rows)
    batch = (
        spark.read.schema(EVENT_SCHEMA)
        .parquet(src)
        .groupBy(SF.session_window("ts", "5 minutes").alias("sw"), "user_id")
        .agg(SF.count(SF.lit(1)).alias("n_events"))
        .select("user_id", SF.col("sw.start").alias("start"), "n_events")
    )
    expected = {(r["user_id"], str(r["start"])): r["n_events"] for r in batch.collect()}

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    sess = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(SF.session_window("ts", "5 minutes").alias("sw"), "user_id")
        .agg(SF.count(SF.lit(1)).alias("n_events"))
        .select("user_id", SF.col("sw.start").alias("start"), "n_events")
    )
    run_available_now(sess, "session_sink", output_mode="complete")
    got = {
        (r["user_id"], str(r["start"])): r["n_events"]
        for r in spark.table("session_sink").collect()
    }
    assert got == expected
    assert got[(1, "2024-01-01 10:00:00")] == 2  # merged 2-min-gap events
    assert got[(1, "2024-01-01 10:30:00")] == 1


def test_stream_dedup_with_watermark(spark, tmp_path):
    src = str(tmp_path / "events")
    _write_events(
        spark,
        src,
        [
            (1, "2024-01-01 01:00:00", 1, "click", 1.0),
            (1, "2024-01-01 01:00:00", 1, "click", 1.0),  # exact dup
            (2, "2024-01-01 01:05:00", 1, "view", 2.0),
        ],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    deduped = stream_dedup_with_watermark(stream, keys=["event_id"])
    run_available_now(deduped, "dedup_sink", output_mode="append")
    assert spark.table("dedup_sink").count() == 2


def test_stream_stream_join_within_bound(spark, tmp_path):
    """Purchases join clicks of the same user within 30 minutes AFTER
    the click; a purchase 2h later must NOT join."""
    from crane_spark.streaming.pipelines import stream_stream_join

    clicks_src = str(tmp_path / "clicks")
    buys_src = str(tmp_path / "buys")
    _write_events(
        spark,
        clicks_src,
        [
            (1, "2024-01-01 10:00:00", 1, "click", 0.0),
            (2, "2024-01-01 12:00:00", 2, "click", 0.0),
        ],
    )
    _write_events(
        spark,
        buys_src,
        [
            (10, "2024-01-01 09:50:00", 1, "purchase", 5.0),  # 10 min before click 1
            (11, "2024-01-01 06:00:00", 2, "purchase", 9.0),  # 6h before click 2: out of bound
        ],
    )
    clicks = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(clicks_src)
        .selectExpr("event_id AS click_id", "user_id", "ts")
    )
    buys = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(buys_src)
        .selectExpr("event_id AS buy_id", "user_id", "ts AS buy_ts", "value")
    )
    out = stream_stream_join(
        clicks, buys, key="user_id", left_ts="ts", right_ts="buy_ts", within="30 minutes"
    ).select("click_id", "buy_id", "value")
    run_available_now(out, "ss_join_sink", output_mode="append")
    rows = {(r["click_id"], r["buy_id"]) for r in spark.table("ss_join_sink").collect()}
    assert rows == {(1, 10)}  # click 2's purchase was 6h earlier -> dropped


def test_stream_static_enrich(spark, sf_dir, tmp_path):
    from crane_spark.tables import table

    src = str(tmp_path / "events")
    _write_events(
        spark,
        src,
        [(1, "2024-01-01 01:00:00", 3, "click", 1.0), (2, "2024-01-01 01:01:00", 7, "view", 2.0)],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    cust = table(spark, sf_dir, "customer")
    joined = stream_static_enrich(
        stream, cust, F.col("user_id") == F.col("c_custkey")
    ).select("event_id", "user_id", "c_name", "c_mktsegment")
    run_available_now(joined, "enrich_sink", output_mode="append")
    rows = {r["user_id"]: r["c_name"] for r in spark.table("enrich_sink").collect()}
    assert set(rows) == {3, 7}
    assert all(name is not None for name in rows.values())


def test_stream_stream_left_outer_join_emits_nulls(spark, tmp_path):
    """A left row with no match emits with nulls — but only once the
    watermark passes its join bound; a later batch's events advance
    the watermark and flush it."""
    from crane_spark.streaming.pipelines import stream_stream_outer_join

    clicks_src = str(tmp_path / "oclicks")
    buys_src = str(tmp_path / "obuys")
    _write_events(
        spark,
        clicks_src,
        [
            (1, "2024-01-01 10:00:00", 1, "click", 0.0),  # matched
            (2, "2024-01-01 10:00:00", 2, "click", 0.0),  # never matched
        ],
    )
    _write_events(
        spark, buys_src, [(10, "2024-01-01 10:10:00", 1, "purchase", 5.0)]
    )
    # Second files: far-future rows whose only job is to advance the
    # watermark in a later micro-batch so batch-1 unmatched state flushes.
    _write_events(
        spark, clicks_src, [(99, "2024-01-02 10:00:00", 9, "click", 0.0)]
    )
    _write_events(
        spark, buys_src, [(98, "2024-01-02 10:00:00", 8, "purchase", 0.0)]
    )
    clicks = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(clicks_src)
        .selectExpr("event_id AS click_id", "user_id AS cu", "ts AS click_ts")
    )
    buys = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(buys_src)
        .selectExpr("event_id AS buy_id", "user_id AS cu", "ts AS buy_ts", "value")
    )
    out = stream_stream_outer_join(
        clicks, buys, key="cu", left_ts="click_ts", right_ts="buy_ts",
        watermark="10 minutes", within="30 minutes",
    ).select("click_id", "buy_id")
    run_available_now(out, "ss_outer_sink", output_mode="append")
    rows = {(r["click_id"], r["buy_id"]) for r in spark.table("ss_outer_sink").collect()}
    assert (1, 10) in rows          # matched pair
    assert (2, None) in rows        # unmatched left flushed by watermark
    assert (99, None) not in rows   # flusher's own bound never passed


def test_stream_dedup_within_watermark_collapses_retries(spark, tmp_path):
    """dropDuplicatesWithinWatermark dedups on business keys alone:
    a replayed event whose retry carries a DIFFERENT timestamp still
    collapses (plain dropDuplicates on keys+ts would keep both)."""
    from crane_spark.streaming.pipelines import stream_dedup_within_watermark

    src = str(tmp_path / "retries")
    _write_events(
        spark,
        src,
        [
            (1, "2024-01-01 01:00:00", 1, "click", 1.0),
            (1, "2024-01-01 01:00:07", 1, "click", 1.0),  # retry, ts drifted
            (2, "2024-01-01 01:02:00", 2, "view", 2.0),
        ],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    deduped = stream_dedup_within_watermark(stream, ["event_id"], watermark="1 hour")
    run_available_now(deduped.select("event_id", "user_id"), "ddww_sink", output_mode="append")
    got = sorted(r["event_id"] for r in spark.table("ddww_sink").collect())
    assert got == [1, 2]


def test_incremental_ingest_dedups_across_runs(spark, tmp_path):
    """Two ingestion runs over one store: run 2 re-delivers a document
    whose text already landed in run 1 plus an in-batch duplicate pair;
    only genuinely novel texts append."""
    from crane_spark.streaming.pipelines import stream_incremental_ingest

    src = str(tmp_path / "crawl")
    store = str(tmp_path / "corpus_store")
    ck = str(tmp_path / "ingest_ck")
    schema = "doc_id long, text string"

    spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    q = stream_incremental_ingest(
        spark.readStream.schema(schema).parquet(src), store, ck
    )
    q.awaitTermination(60)

    spark.createDataFrame(
        [(3, "gamma delta"),   # cross-run duplicate text
         (4, "epsilon zeta"),
         (5, "epsilon zeta")],  # in-batch duplicate pair
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    q = stream_incremental_ingest(
        spark.readStream.schema(schema).parquet(src), store, ck
    )
    q.awaitTermination(60)

    stored = spark.read.parquet(store)
    texts = sorted(r["text"] for r in stored.collect())
    assert texts == ["alpha beta", "epsilon zeta", "gamma delta"]


def test_statestore_reader_exposes_streaming_state(spark, tmp_path):
    """Spark 4 state-store data source: the persisted state of a
    stateful streaming query is itself queryable as a DataFrame from
    the checkpoint — the observability surface for debugging a
    100 TB streaming job's state without instrumenting the job
    (which keys, what counts, which shuffle partition holds them)."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("x\nx\ny\n")
    ck = str(tmp_path / "ck")
    counts = spark.readStream.text(str(src)).groupBy("value").count()
    q = (
        counts.writeStream.format("memory")
        .queryName("state_reader_probe")
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    state = spark.read.format("statestore").load(ck)
    got = {(r["key"]["value"], r["value"]["count"]) for r in state.collect()}
    assert got == {("x", 2), ("y", 1)}
    # every state row carries its owning shuffle partition — the handle
    # for locating skewed state at scale
    assert all(r["partition_id"] >= 0 for r in state.collect())


def test_timer_finalized_sessions(spark, tmp_path):
    """Event-time timeout timers: sessions are emitted exactly once,
    only after the watermark passes last_event + gap, then their state
    is removed. Run 1 accumulates open sessions (nothing emitted);
    run 2's far-future event advances the watermark, firing the
    timeout handler for both idle sessions."""
    from crane_spark.streaming.stateful import finalized_sessions
    from crane_spark.streaming.pipelines import stream_to_parquet

    src = str(tmp_path / "events")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, "user string, ts timestamp").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        stream = (
            spark.readStream.schema("user string, ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = stream_to_parquet(
            finalized_sessions(stream, "user", "ts", gap_minutes=30), sink, ckpt
        )
        q.awaitTermination(120)

    import datetime as dt

    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    write(
        [
            ("a", t("2024-01-01 01:00:00")),
            ("a", t("2024-01-01 01:10:00")),
            ("b", t("2024-01-01 01:05:00")),
        ]
    )
    run()
    write([("c", t("2024-01-01 09:00:00"))])
    run()
    got = {
        r["key"]: (str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got["a"] == ("2024-01-01 01:00:00", "2024-01-01 01:10:00", 2)
    assert got["b"] == ("2024-01-01 01:05:00", "2024-01-01 01:05:00", 1)
    assert "c" not in got  # still open: watermark has not passed 09:30


def test_stream_stream_full_outer_join(spark, tmp_path):
    """fullOuter adds the symmetric right-side null emission: an
    unmatched BUY also flushes once the watermark passes its bound."""
    from crane_spark.streaming.pipelines import stream_stream_outer_join

    clicks_src = str(tmp_path / "foclicks")
    buys_src = str(tmp_path / "fobuys")
    _write_events(
        spark,
        clicks_src,
        [
            (1, "2024-01-01 10:00:00", 1, "click", 0.0),  # matched
            (2, "2024-01-01 10:00:00", 2, "click", 0.0),  # unmatched left
        ],
    )
    _write_events(
        spark,
        buys_src,
        [
            (10, "2024-01-01 10:10:00", 1, "purchase", 5.0),  # matched
            (20, "2024-01-01 10:10:00", 7, "purchase", 9.0),  # unmatched right
        ],
    )
    _write_events(spark, clicks_src, [(99, "2024-01-02 10:00:00", 9, "click", 0.0)])
    _write_events(spark, buys_src, [(98, "2024-01-02 10:00:00", 8, "purchase", 0.0)])
    clicks = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(clicks_src)
        .selectExpr("event_id AS click_id", "user_id AS cu", "ts AS click_ts")
    )
    buys = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(buys_src)
        .selectExpr("event_id AS buy_id", "user_id AS cu", "ts AS buy_ts", "value")
    )
    out = stream_stream_outer_join(
        clicks, buys, key="cu", left_ts="click_ts", right_ts="buy_ts",
        watermark="10 minutes", within="30 minutes", how="fullOuter",
    ).select("click_id", "buy_id")
    run_available_now(out, "ss_full_outer_sink", output_mode="append")
    rows = {(r["click_id"], r["buy_id"]) for r in spark.table("ss_full_outer_sink").collect()}
    assert (1, 10) in rows          # matched pair
    assert (2, None) in rows        # unmatched left
    assert (None, 20) in rows       # unmatched right — fullOuter's addition


def test_stream_union_two_sources(spark, tmp_path):
    """Two file streams UNION into one logical stream; the unioned
    stateful agg equals the batch union (the multi-spout topology the
    reference cannot express — its Topology is strictly linear,
    util.py:28-38)."""
    a_src, b_src = str(tmp_path / "ua"), str(tmp_path / "ub")
    _write_events(spark, a_src, [(1, "2024-01-01 10:00:00", 1, "click", 1.0),
                                 (2, "2024-01-01 10:01:00", 2, "view", 1.0)])
    _write_events(spark, b_src, [(3, "2024-01-01 10:02:00", 1, "click", 1.0),
                                 (4, "2024-01-01 10:03:00", 3, "click", 1.0)])
    read = lambda p: spark.readStream.schema(EVENT_SCHEMA).parquet(p)  # noqa: E731
    unioned = read(a_src).unionByName(read(b_src))
    counts = unioned.groupBy("event_type").count()
    run_available_now(counts, "union_sink", output_mode="complete")
    got = {(r["event_type"], r["count"]) for r in spark.table("union_sink").collect()}
    assert got == {("click", 3), ("view", 1)}


def test_rate_micro_batch_source(spark):
    """Deterministic synthetic source (rate-micro-batch): fixed rows
    per micro-batch with synthetic event time — the load-generator
    twin of the reference's file-replay spout."""
    import time

    stream = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", "5")
        .option("startTimestamp", "0")
        .option("advanceMillisPerBatch", "1000")
        .load()
    )
    q = (
        stream.selectExpr("timestamp", "value")
        .writeStream.format("memory")
        .queryName("rate_sink")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("rate_sink").count() >= 10:
                break
            time.sleep(0.2)
        rows = spark.table("rate_sink").collect()
        assert len(rows) >= 10
        values = sorted(r["value"] for r in rows)
        assert values[:10] == list(range(10))  # gapless monotone sequence
    finally:
        q.stop()


def test_streaming_query_listener_observability(spark, tmp_path):
    """StreamingQueryListener receives progress events with row counts
    — the ops-plane replacement for the reference master's console
    bookkeeping (crane_master.py:166-169)."""
    from pyspark.sql.streaming import StreamingQueryListener

    events = {"progress": [], "started": 0, "terminated": 0}

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, e):
            events["started"] += 1

        def onQueryProgress(self, e):
            events["progress"].append(e.progress.numInputRows)

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            events["terminated"] += 1

    spark.streams.addListener(listener := Capture())
    try:
        src = str(tmp_path / "listener_src")
        _write_events(spark, src, [(1, "2024-01-01 10:00:00", 1, "click", 1.0),
                                   (2, "2024-01-01 10:01:00", 2, "view", 2.0)])
        counts = (
            spark.readStream.schema(EVENT_SCHEMA).parquet(src)
            .groupBy("event_type").count()
        )
        run_available_now(counts, "listener_sink", output_mode="complete")
        # Listener callbacks arrive on a separate dispatch thread —
        # poll instead of asserting immediately after termination.
        import time

        deadline = time.time() + 30
        while time.time() < deadline and sum(events["progress"]) < 2:
            time.sleep(0.2)
        assert events["started"] >= 1
        assert sum(events["progress"]) >= 2  # both input rows observed
    finally:
        spark.streams.removeListener(listener)


def test_sliding_window_stream_overlapping_buckets(spark, tmp_path):
    """SLIDING (hopping) windows under readStream: a 2h window with a
    1h slide puts every event in exactly two overlapping windows, and
    counts per window match the by-hand assignment."""
    src = str(tmp_path / "events")
    _write_events(
        spark,
        src,
        [
            (1, "2024-01-01 01:10:00", 1, "click", 1.0),
            (2, "2024-01-01 01:40:00", 1, "click", 2.0),
            (3, "2024-01-01 02:20:00", 2, "click", 3.0),
        ],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (
        windowed_event_stats(stream, window="2 hours", watermark="1 hour", slide="1 hour")
        .writeStream.format("memory")
        .queryName("sliding_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        str(r["window_start"]): r["n_events"]
        for r in spark.table("sliding_sink").collect()
    }
    # windows [00:00,02:00) [01:00,03:00) [02:00,04:00)
    assert got == {
        "2024-01-01 00:00:00": 2,
        "2024-01-01 01:00:00": 3,
        "2024-01-01 02:00:00": 1,
    }


def test_stream_neardup_ingest_across_runs(spark, tmp_path):
    """Streaming MinHash-LSH near-dedup ingest: within-batch near-dups
    drop (lower id kept), cross-RUN near-dups drop against the
    persisted band index, novel docs append — all with availableNow +
    one checkpoint."""
    from crane_spark.streaming.pipelines import stream_neardup_ingest

    src = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"
    base = " ".join(f"w{i}" for i in range(30))
    near1 = base.replace("w29", "x29")            # near-dup of base
    near2 = base.replace("w0", "y0")              # near-dup, arrives next run
    novel = " ".join(f"n{i}" for i in range(30))

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = stream_neardup_ingest(stream, store, ckpt)
        q.awaitTermination(120)

    spark.createDataFrame([(1, base), (2, near1), (10, novel)], schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    run()
    got1 = sorted(r["doc_id"] for r in spark.read.parquet(store + "/docs").collect())
    assert got1 == [1, 10]  # 2 dropped within-batch against 1

    spark.createDataFrame(
        [(20, near2), (21, " ".join(f"z{i}" for i in range(30)))], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    got2 = sorted(r["doc_id"] for r in spark.read.parquet(store + "/docs").collect())
    assert got2 == [1, 10, 21]  # 20 dropped against run-1's index
    # index holds bands only for accepted docs
    idx_ids = {r["doc_id"] for r in spark.read.parquet(store + "/bands").collect()}
    assert idx_ids == {1, 10, 21}


def test_stream_neardup_ingest_replay_idempotent(spark, tmp_path):
    """Losing the checkpoint (worst-case replay) must NOT duplicate
    the store: replayed docs collide with their own persisted bands
    and self-verify at J=1, so re-appends never happen — the
    content-based exactly-once argument from the docstring, tested."""
    import shutil

    from crane_spark.streaming.pipelines import stream_neardup_ingest

    src = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"
    rows = [(1, " ".join(f"w{i}" for i in range(30))),
            (2, " ".join(f"n{i}" for i in range(30)))]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)

    def run():
        q = stream_neardup_ingest(
            spark.readStream.schema(schema).parquet(src), store, ckpt
        )
        q.awaitTermination(120)

    run()
    first = sorted(
        (r["doc_id"], r["text"]) for r in spark.read.parquet(store + "/docs").collect()
    )
    shutil.rmtree(ckpt)  # simulate total checkpoint loss -> full replay
    run()
    again = sorted(
        (r["doc_id"], r["text"]) for r in spark.read.parquet(store + "/docs").collect()
    )
    assert first == again == [(r[0], r[1]) for r in rows]


def test_idempotent_append_sink_survives_replay(spark, tmp_path):
    """Replay of a batch on the SAME checkpoint (the crash-between-
    write-and-commit case, simulated by deleting the commit record so
    Spark re-runs batch 0 under the same query id) must not duplicate
    a row — once via the marker fast path, once via the per-batch
    overwrite with the marker gone (the crashed-before-marker case)."""
    import os

    from crane_spark.streaming.pipelines import (
        read_idempotent_sink,
        stream_append_idempotent,
    )

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.range(10).coalesce(1).write.parquet(src)

    def run():
        q = stream_append_idempotent(
            spark.readStream.schema("id bigint").parquet(src), out, ckpt
        )
        q.awaitTermination(120)

    def uncommit():
        # drop the commit record (and its Hadoop checksum sidecar) so
        # Spark re-runs batch 0 under the SAME query id
        os.remove(os.path.join(ckpt, "commits", "0"))
        crc = os.path.join(ckpt, "commits", ".0.crc")
        if os.path.exists(crc):
            os.remove(crc)

    run()
    assert read_idempotent_sink(spark, out).count() == 10

    # replay with the marker present: fast-path skip
    uncommit()
    run()
    got = sorted(r["id"] for r in read_idempotent_sink(spark, out).collect())
    assert got == list(range(10))

    # replay with the marker ALSO lost: overwrite path replaces the
    # batch's own directory instead of appending next to it
    uncommit()
    for m in os.listdir(out + "/ledger"):
        os.remove(os.path.join(out, "ledger", m))
    run()
    got = sorted(r["id"] for r in read_idempotent_sink(spark, out).collect())
    assert got == list(range(10))
    markers = os.listdir(out + "/ledger")
    assert len(markers) == 1 and markers[0].endswith("-0.done")


def test_idempotent_append_sink_checkpoint_loss_is_at_least_once(spark, tmp_path):
    """Total checkpoint loss regenerates the query id, so the rebuilt
    batch 0 (which may now hold DIFFERENT data) is applied under a
    fresh scope: the failure direction is visible re-delivery, never
    the silent data loss a batch-id-only ledger would cause by
    trusting stale ids."""
    import shutil

    from crane_spark.streaming.pipelines import (
        read_idempotent_sink,
        stream_append_idempotent,
    )

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.range(10).coalesce(1).write.parquet(src)

    def run():
        q = stream_append_idempotent(
            spark.readStream.schema("id bigint").parquet(src), out, ckpt
        )
        q.awaitTermination(120)

    run()
    shutil.rmtree(ckpt)
    # new data lands after the checkpoint is lost: the rebuilt batch 0
    # covers MORE than the original batch 0 did
    spark.range(10, 15).coalesce(1).write.mode("append").parquet(src)
    run()
    got = sorted(r["id"] for r in read_idempotent_sink(spark, out).collect())
    # old rows duplicated (at-least-once), new rows PRESENT (no loss)
    assert got == sorted(list(range(10)) * 2 + list(range(10, 15)))


def test_stream_neardup_ingest_short_docs(spark, tmp_path):
    """Documents with fewer than shingle_n tokens have no bands; the
    exact-hash path must still dedup them within-batch, across runs,
    and across checkpoint loss (replay idempotence)."""
    import shutil

    from crane_spark.streaming.pipelines import stream_neardup_ingest

    src = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    def run():
        q = stream_neardup_ingest(
            spark.readStream.schema(schema).parquet(src), store, ckpt
        )
        q.awaitTermination(120)

    # within-batch: two identical short docs -> min-id kept
    spark.createDataFrame(
        [(1, "hi there"), (2, "hi there"), (3, "bye now")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    got1 = sorted(r["doc_id"] for r in spark.read.parquet(store + "/docs").collect())
    assert got1 == [1, 3]

    # across runs: a repeat short doc drops, a novel one lands
    spark.createDataFrame([(5, "hi there"), (6, "so long")], schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    run()
    got2 = sorted(r["doc_id"] for r in spark.read.parquet(store + "/docs").collect())
    assert got2 == [1, 3, 6]

    # checkpoint loss -> full replay: short docs must not re-append
    shutil.rmtree(ckpt)
    run()
    got3 = sorted(r["doc_id"] for r in spark.read.parquet(store + "/docs").collect())
    assert got3 == [1, 3, 6]
    # exact-hash rows live in the index under band = -1
    bands = spark.read.parquet(store + "/bands")
    assert bands.filter("band = -1").count() >= 3


def test_stream_training_corpus_single_drain_matches_batch_funnel(
    spark, sf_dir, tmp_path
):
    """An availableNow drain that sees all documents in ONE batch must
    reproduce the batch funnel's stage counts and corpus content
    exactly (same thresholds, same hashes, same shard deal)."""
    import pyspark.sql.functions as F

    from crane_spark.llm.run_pipeline import (
        build_training_corpus,
        read_stream_corpus,
        stream_training_corpus,
    )
    from crane_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    src = str(tmp_path / "src")
    docs.filter(F.col("doc_id") >= 20).coalesce(1).write.parquet(src)

    batch_root = str(tmp_path / "batch_store")
    batch_counts = build_training_corpus(spark, sf_dir, batch_root)

    stream_root = str(tmp_path / "stream_store")
    q = stream_training_corpus(
        spark.readStream.schema(docs.schema).parquet(src),
        docs.filter(F.col("doc_id") < 20),
        stream_root,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    corpus, report = read_stream_corpus(spark, stream_root)
    got = {r["stage"]: r["n_docs"] for r in report.collect()}
    want = {k: v for k, v in batch_counts.items() if not k.startswith("_")}
    assert got == want
    assert corpus.count() == want["4_mixed"]
    from crane_spark.sources import versioned as V

    batch_corpus = V.get(spark, batch_root, "corpus")
    assert corpus.exceptAll(batch_corpus).count() == 0
    assert batch_corpus.exceptAll(corpus).count() == 0


def test_compact_corpus_ledger_preserves_semantics(spark, sf_dir, tmp_path):
    """Compacting the corpus ledger between batches (r9 verdict #7)
    must change NOTHING observable: the report totals, cumulative
    lang counts (and therefore the mixing thresholds of later
    batches), the admitted corpus, and the exact-dedup probe must all
    match a never-compacted twin run fed identical batches."""
    import pyspark.sql.functions as F

    from crane_spark.llm.run_pipeline import (
        compact_corpus_ledger,
        read_stream_corpus,
        stream_training_corpus,
    )
    from crane_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") < 20)
    batches = [
        docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 120)),
        docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 220)),  # overlap
        docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 320)),  # overlap
    ]

    def feed_and_run(tag: str, compact_after: int | None):
        src = str(tmp_path / f"src_{tag}")
        root = str(tmp_path / f"store_{tag}")
        ckpt = str(tmp_path / f"ckpt_{tag}")
        for i, b in enumerate(batches):
            b.coalesce(1).write.mode("append").parquet(src)
            q = stream_training_corpus(
                spark.readStream.schema(docs.schema).parquet(src),
                eval_docs,
                root,
                ckpt,
            )
            q.awaitTermination(180)
            if compact_after is not None and i == compact_after:
                out = compact_corpus_ledger(spark, root)
                assert set(out) == {"hashes", "lang_counts", "report"}
        return root

    plain = feed_and_run("plain", None)
    compacted = feed_and_run("compacted", 1)  # compact between batch 2 and 3

    c_a, r_a = read_stream_corpus(spark, plain)
    c_b, r_b = read_stream_corpus(spark, compacted)
    assert {(r["stage"], r["n_docs"]) for r in r_a.collect()} == {
        (r["stage"], r["n_docs"]) for r in r_b.collect()
    }
    assert c_a.exceptAll(c_b).count() == 0 and c_b.exceptAll(c_a).count() == 0
    # probe state intact: the full hash sets agree
    ha = {
        r["_h"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .option("mergeSchema", "true")
        .parquet(plain + "/hashes")
        .collect()
    }
    hb = {
        r["_h"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .option("mergeSchema", "true")
        .parquet(compacted + "/hashes")
        .collect()
    }
    assert ha == hb


@pytest.mark.parametrize("killed_store", ["hashes", "lang_counts", "report"])
@pytest.mark.parametrize("kill_point", [0, 1, 2])
def test_compact_corpus_ledger_crash_matrix(
    spark, tmp_path, monkeypatch, killed_store, kill_point
):
    """Crash-injection matrix for compact_corpus_ledger's three store
    rewrites (r9 verdict #7, the same discipline as
    test_store_maintenance_swap_crash_matrix): kill once in every gap
    of each store's two-rename swap; a recovery rerun must land all
    three stores exactly on the never-crashed result with no stranded
    side dirs."""
    import glob
    import os
    import shutil

    from crane_spark.llm.run_pipeline import compact_corpus_ledger

    store = str(tmp_path / "store")
    ref = str(tmp_path / "ref")
    h_schema = "_h string, query_id string, batch_id long"
    c_schema = "query_id string, batch_id long, lang string, n long"
    r_schema = "query_id string, batch_id long, stage string, n_docs long"
    for root in (store, ref):
        for b in (0, 1):
            spark.createDataFrame(
                [(f"h{b}{i}", "q", b) for i in range(4)], h_schema
            ).coalesce(1).write.parquet(f"{root}/hashes/q/batch-{b}")
            spark.createDataFrame(
                [("q", b, "en", 3 + b), ("q", b, "de", 1)], c_schema
            ).coalesce(1).write.parquet(f"{root}/lang_counts/q/batch-{b}")
            spark.createDataFrame(
                [("q", b, "0_raw", 4), ("q", b, "4_mixed", 3 + b)], r_schema
            ).coalesce(1).write.parquet(f"{root}/report/q/batch-{b}")

    def content(root):
        rep = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(root + "/report")
            .groupBy("stage")
            .agg(F.sum("n_docs").alias("n_docs"))
        )
        langs = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(root + "/lang_counts")
            .groupBy("lang")
            .agg(F.sum("n").alias("n"))
        )
        hashes = (
            spark.read.option("recursiveFileLookup", "true")
            .option("mergeSchema", "true")
            .parquet(root + "/hashes")
        )
        return (
            sorted((r["stage"], r["n_docs"]) for r in rep.collect()),
            sorted((r["lang"], r["n"]) for r in langs.collect()),
            sorted(r["_h"] for r in hashes.collect()),
        )

    compact_corpus_ledger(spark, ref)
    want = content(ref)

    real_rename, real_rmtree = os.rename, shutil.rmtree
    state = {"step": 0, "armed": True}
    target = store + "/" + killed_store

    def guard():
        if state["step"] == kill_point:
            raise RuntimeError("injected crash in ledger compact")
        state["step"] += 1

    def rename(src, dst, **kw):
        if state["armed"] and target in str(src):
            guard()
        return real_rename(src, dst, **kw)

    def rmtree(path, *a, **kw):
        if state["armed"] and target in str(path):
            guard()
        return real_rmtree(path, *a, **kw)

    monkeypatch.setattr(os, "rename", rename)
    monkeypatch.setattr(shutil, "rmtree", rmtree)
    with pytest.raises(RuntimeError, match="injected crash"):
        compact_corpus_ledger(spark, store)
    state["armed"] = False

    compact_corpus_ledger(spark, store)  # recovery rerun
    assert content(store) == want
    for name in ("hashes", "lang_counts", "report"):
        for suffix in (".old", ".compact"):
            assert not os.path.exists(f"{store}/{name}{suffix}")
        assert glob.glob(f"{store}/{name}.merged*") == []


def test_corpus_bloom_front_skips_probe_and_preserves_semantics(
    spark, sf_dir, tmp_path
):
    """bloom_front=True on the corpus stream must admit exactly what
    the un-fronted stream admits: an all-novel batch skips the ledger
    probe (probes_skipped), a repeat batch hits the front, runs the
    probe and drops the duplicates, and the final corpus + report
    equal the un-fronted twin's."""
    import pyspark.sql.functions as F

    from crane_spark.llm.run_pipeline import (
        read_stream_corpus,
        stream_training_corpus,
    )
    from crane_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") < 20)
    batches = [
        docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 120)),
        docs.filter((F.col("doc_id") >= 120) & (F.col("doc_id") < 220)),  # novel
        docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 220)),  # repeats
    ]

    def run(tag, front, stats):
        src = str(tmp_path / f"src_{tag}")
        root = str(tmp_path / f"store_{tag}")
        ckpt = str(tmp_path / f"ckpt_{tag}")
        for b in batches:
            b.coalesce(1).write.mode("append").parquet(src)
            q = stream_training_corpus(
                spark.readStream.schema(docs.schema).parquet(src),
                eval_docs,
                root,
                ckpt,
                bloom_front=front,
                bloom_stats=stats,
            )
            q.awaitTermination(180)
        return root

    plain = run("plain", False, None)
    stats: dict = {}
    fronted = run("fronted", True, stats)

    # batch 2 is all-novel vs batch 1's ledger -> at least one skip;
    # batch 3 repeats batch 2's docs -> the front hits, probe runs
    assert stats["probes_skipped"] >= 1
    assert stats["probes_run"] >= 1 and stats["keys_tested"] > 0

    c_a, r_a = read_stream_corpus(spark, plain)
    c_b, r_b = read_stream_corpus(spark, fronted)
    assert {(r["stage"], r["n_docs"]) for r in r_a.collect()} == {
        (r["stage"], r["n_docs"]) for r in r_b.collect()
    }
    assert c_a.exceptAll(c_b).count() == 0 and c_b.exceptAll(c_a).count() == 0


def test_stream_training_corpus_incremental_and_replay(spark, sf_dir, tmp_path):
    """Multi-batch ingestion: later arrivals dedup against the
    persisted hash index, the corpus never holds two docs with the
    same text, and a full replay after checkpoint loss adds ZERO new
    corpus rows (content-keyed dedup makes the funnel idempotent even
    without the checkpoint)."""
    import shutil

    import pyspark.sql.functions as F

    from crane_spark.llm.run_pipeline import (
        read_stream_corpus,
        stream_training_corpus,
    )
    from crane_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") < 20)
    src = str(tmp_path / "src")
    root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = stream_training_corpus(
            spark.readStream.schema(docs.schema).parquet(src), eval_docs, root, ckpt
        )
        q.awaitTermination(180)

    first = docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 200))
    first.coalesce(1).write.mode("append").parquet(src)
    run()
    corpus1, _ = read_stream_corpus(spark, root)
    n1 = corpus1.count()
    assert n1 > 0

    # second run: half repeats (same text -> hash-dropped), half new
    second = docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 300))
    second.coalesce(1).write.mode("append").parquet(src)
    run()
    corpus2, report2 = read_stream_corpus(spark, root)
    n2 = corpus2.count()
    assert n2 >= n1
    # content-unique: no two corpus rows share a text
    assert (
        corpus2.select(F.md5("text")).distinct().count() == n2
    )
    # repeated doc_ids were not re-admitted
    assert corpus2.select("doc_id").distinct().count() == n2

    # checkpoint loss -> full replay: nothing re-enters the corpus
    shutil.rmtree(ckpt)
    run()
    corpus3, _ = read_stream_corpus(spark, root)
    assert corpus3.count() == n2


def test_stream_training_corpus_same_checkpoint_replay(spark, sf_dir, tmp_path):
    """Crash in the foreachBatch replay window: the batch's OWN hash
    shard is already on disk but its checkpoint commit file is not, so
    Structured Streaming replays the same (queryId, batch_id). The
    known-hash anti-join must exclude the batch's own (qid, batch)
    ledger rows — otherwise the replay dedups against itself and
    silently overwrites corpus/<qid>/batch-N with an empty frame."""
    import os

    import pyspark.sql.functions as F

    from crane_spark.llm.run_pipeline import (
        read_stream_corpus,
        stream_training_corpus,
    )
    from crane_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") < 20)
    src = str(tmp_path / "src")
    root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = stream_training_corpus(
            spark.readStream.schema(docs.schema).parquet(src), eval_docs, root, ckpt
        )
        q.awaitTermination(180)

    docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 200)).coalesce(
        1
    ).write.mode("append").parquet(src)
    run()
    corpus1, _ = read_stream_corpus(spark, root)
    rows1 = sorted(r["doc_id"] for r in corpus1.collect())
    assert rows1

    # simulate a crash AFTER the batch's outputs (incl. its hashes/
    # shard) hit disk but BEFORE the commit was recorded: remove only
    # the newest commit file, keep offsets + every data directory.
    commits = sorted(os.listdir(os.path.join(ckpt, "commits")))
    committed = [c for c in commits if not c.startswith(".")]
    os.remove(os.path.join(ckpt, "commits", committed[-1]))
    crc = os.path.join(ckpt, "commits", f".{committed[-1]}.crc")
    if os.path.exists(crc):  # local-FS checksum twin of the commit file
        os.remove(crc)
    run()

    corpus2, _ = read_stream_corpus(spark, root)
    assert sorted(r["doc_id"] for r in corpus2.collect()) == rows1

    # and a later, genuinely-new batch still dedups against the store
    docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 250)).coalesce(
        1
    ).write.mode("append").parquet(src)
    run()
    corpus3, _ = read_stream_corpus(spark, root)
    n3 = corpus3.count()
    assert corpus3.select(F.md5("text")).distinct().count() == n3
    assert n3 >= len(rows1)


def test_stream_vector_ingest_and_probe(spark, sf_dir, tmp_path):
    """Incremental IVF index: two ingest runs accumulate vectors into
    the cell-assigned store; probing the read-back store (reusing the
    stored assignment) equals ivf_probe_topk over the same vectors
    computed fresh; checkpoint-loss replay never double-counts."""
    import shutil

    import pyspark.sql.functions as F

    from crane_spark.llm.similarity import ivf_probe_topk
    from crane_spark.streaming.pipelines import (
        read_vector_index,
        stream_vector_ingest,
    )
    from crane_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    src = str(tmp_path / "src")
    store = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    schema = emb.schema

    def run():
        q = stream_vector_ingest(
            spark.readStream.schema(schema).parquet(src), store, ckpt, centroids
        )
        q.awaitTermination(120)

    emb.filter((F.col("vec_id") >= 15) & (F.col("vec_id") < 60)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()
    emb.filter(F.col("vec_id") >= 60).coalesce(1).write.mode("append").parquet(src)
    run()

    idx = read_vector_index(spark, store)
    candidates = emb.filter(F.col("vec_id") >= 15)
    assert idx.count() == candidates.count()

    queries = emb.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 13))
    served = ivf_probe_topk(
        queries,
        idx.select("vec_id", "embedding"),
        centroids,
        k=3,
        probes=2,
        assigned=idx.select("vec_id", "centroid_id"),
    ).collect()
    fresh = ivf_probe_topk(queries, candidates, centroids, k=3, probes=2).collect()
    as_set = lambda rows: {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rn"]) for r in rows
    }
    assert as_set(served) == as_set(fresh)

    # checkpoint loss -> full re-delivery under a new query id; the
    # reader's id-dedup keeps the index exact
    shutil.rmtree(ckpt)
    run()
    assert read_vector_index(spark, store).count() == candidates.count()


def test_compact_neardup_store_dedups_index_and_preserves_semantics(spark, tmp_path):
    """After a crash-replay bloats the band index with duplicate rows,
    compaction removes them without changing ingest behavior: a
    post-compaction run still drops repeats and admits novelty."""
    import shutil

    from crane_spark.streaming.pipelines import (
        compact_neardup_store,
        stream_neardup_ingest,
    )

    src = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"
    base = " ".join(f"w{i}" for i in range(30))

    def run():
        q = stream_neardup_ingest(
            spark.readStream.schema(schema).parquet(src), store, ckpt
        )
        q.awaitTermination(120)

    spark.createDataFrame([(1, base)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()
    shutil.rmtree(ckpt)  # full replay appends duplicate band rows
    run()
    n_before = spark.read.parquet(store + "/bands").count()
    counts = compact_neardup_store(spark, store)
    n_after = spark.read.parquet(store + "/bands").count()
    assert counts["bands"] == n_after <= n_before
    assert spark.read.parquet(store + "/bands").dropDuplicates().count() == n_after

    # semantics preserved: repeat still drops, novel doc still lands
    spark.createDataFrame(
        [(5, base), (6, " ".join(f"z{i}" for i in range(30)))], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    got = sorted(r["doc_id"] for r in spark.read.parquet(store + "/docs").collect())
    assert got == [1, 6]


def test_compact_neardup_store_custom_id_col_and_crash_recovery(spark, tmp_path):
    """Compaction must honor the ingest's id column (a store ingested
    with id_col='item_id' compacts on that key, not a hard-coded
    doc_id) and survive a crash mid-swap: if a previous run renamed
    the live dir aside but died before installing the staging copy,
    the next run restores it instead of treating the store as empty."""
    import os
    import shutil

    from crane_spark.streaming.pipelines import (
        compact_neardup_store,
        stream_neardup_ingest,
    )

    src = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    schema = "item_id long, body string"
    base = " ".join(f"w{i}" for i in range(30))

    def run():
        q = stream_neardup_ingest(
            spark.readStream.schema(schema).parquet(src),
            store,
            ckpt,
            text_col="body",
            id_col="item_id",
        )
        q.awaitTermination(120)

    spark.createDataFrame([(1, base)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()
    shutil.rmtree(ckpt)
    run()  # replay bloats the band index
    counts = compact_neardup_store(spark, store, id_col="item_id")
    bands = spark.read.parquet(store + "/bands")
    assert counts["bands"] == bands.count() == bands.dropDuplicates().count()

    # crash mid-swap: live dir renamed aside, staging copy stranded
    docs_path = os.path.join(store, "docs")
    os.rename(docs_path, docs_path + ".old")
    shutil.copytree(docs_path + ".old", docs_path + ".compact")
    counts2 = compact_neardup_store(spark, store, id_col="item_id")
    assert os.path.exists(docs_path)
    assert not os.path.exists(docs_path + ".old")
    assert not os.path.exists(docs_path + ".compact")
    assert counts2["docs"] == 1
    got = sorted(r["item_id"] for r in spark.read.parquet(docs_path).collect())
    assert got == [1]


def test_stream_heavy_hitters_across_runs_and_replay(spark, tmp_path):
    """Mergeable-sketch heavy hitters: two ingest runs over a skewed
    token stream; the global top set matches exact counts, estimates
    never undercount, and a forced replay changes nothing."""
    import os
    import shutil

    import pyspark.sql.functions as F

    from crane_spark.streaming.pipelines import (
        read_heavy_hitters,
        stream_heavy_hitters,
    )

    src = str(tmp_path / "in")
    store = str(tmp_path / "hh")
    ckpt = str(tmp_path / "ckpt")

    def zipfy(start, n_rows, seed):
        # token t{k} appears ~ n/k times: a clearly skewed stream
        rows = []
        for i in range(n_rows):
            k = 1
            x = (i * 2654435761 + seed) % 1000
            while k < 40 and x > 1000 // (k + 1):
                k += 1
            rows.append((f"t{k}",))
        return spark.createDataFrame(rows, "token string")

    zipfy(0, 3000, 1).coalesce(1).write.mode("append").parquet(src)

    def run():
        q = stream_heavy_hitters(
            spark.readStream.schema("token string").parquet(src), store, ckpt
        )
        q.awaitTermination(120)

    run()
    zipfy(0, 3000, 7).coalesce(1).write.mode("append").parquet(src)
    run()

    exact = {
        r["token"]: r["n"]
        for r in spark.read.parquet(src)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    top5_exact = sorted(exact, key=lambda t: (-exact[t], t))[:5]
    got = read_heavy_hitters(spark, store, top_n=5).collect()
    assert [r["token"] for r in got] == top5_exact
    for r in got:
        assert r["est_count"] >= exact[r["token"]]  # CMS never undercounts

    # replay batch 0 of the second run: rewrites, never double-counts
    commits = os.path.join(ckpt, "commits")
    for f in os.listdir(commits):
        os.remove(os.path.join(commits, f))
    run()
    again = read_heavy_hitters(spark, store, top_n=5).collect()
    assert [(r["token"], r["est_count"]) for r in again] == [
        (r["token"], r["est_count"]) for r in got
    ]
    shutil.rmtree(ckpt)


def test_stream_distinct_sketches_merge_across_runs(spark, tmp_path):
    """HLL sketch blobs persisted per batch must union into accurate
    global per-group distinct counts across runs, with replays
    rewriting rather than inflating."""
    import os

    import pyspark.sql.functions as F

    from crane_spark.streaming.pipelines import (
        read_distinct_counts,
        stream_distinct_sketches,
    )

    src = str(tmp_path / "in")
    store = str(tmp_path / "sk")
    ckpt = str(tmp_path / "ckpt")

    def write(lo, hi, grp):
        spark.range(lo, hi).select(
            F.col("id").alias("user_id"), F.lit(grp).alias("grp")
        ).coalesce(1).write.mode("append").parquet(src)

    write(0, 400, "a")
    write(0, 150, "b")

    def run():
        q = stream_distinct_sketches(
            spark.readStream.schema("user_id long, grp string").parquet(src),
            store,
            ckpt,
            key_col="user_id",
            group_col="grp",
        )
        q.awaitTermination(120)

    run()
    write(200, 600, "a")  # 200 overlap + 200 new -> distinct 600
    run()
    got = {
        r["grp"]: r["approx_distinct"]
        for r in read_distinct_counts(spark, store, "grp").collect()
    }
    assert abs(got["a"] - 600) / 600 < 0.05  # lg_k=14: ~1% typical
    assert abs(got["b"] - 150) / 150 < 0.05

    # replay: same answer
    commits = os.path.join(ckpt, "commits")
    for f in os.listdir(commits):
        os.remove(os.path.join(commits, f))
    run()
    again = {
        r["grp"]: r["approx_distinct"]
        for r in read_distinct_counts(spark, store, "grp").collect()
    }
    assert again == got


def test_stream_distinct_sketches_survive_checkpoint_loss(spark, tmp_path):
    """HLL union is set-idempotent: total checkpoint loss (full
    re-delivery under a new query id) must leave the distinct
    estimates EXACTLY unchanged — the property additive counter
    sketches cannot give."""
    import shutil

    import pyspark.sql.functions as F

    from crane_spark.streaming.pipelines import (
        read_distinct_counts,
        stream_distinct_sketches,
    )

    src = str(tmp_path / "in")
    store = str(tmp_path / "sk")
    ckpt = str(tmp_path / "ckpt")
    spark.range(500).select(F.col("id").alias("user_id")).coalesce(1).write.parquet(src)

    def run():
        q = stream_distinct_sketches(
            spark.readStream.schema("user_id long").parquet(src),
            store,
            ckpt,
            key_col="user_id",
        )
        q.awaitTermination(120)

    run()
    before = read_distinct_counts(spark, store).collect()[0]["approx_distinct"]
    shutil.rmtree(ckpt)
    run()
    after = read_distinct_counts(spark, store).collect()[0]["approx_distinct"]
    assert after == before


def test_incremental_ingest_null_text_dedups_and_is_replay_idempotent(
    spark, tmp_path
):
    """sha2(NULL) is NULL, and a plain-equality anti-join never matches
    NULL keys — before the null-safe probe, a NULL-text doc re-appended
    on EVERY batch and every replay. One null-text row must land in the
    store and stay single across a second run re-delivering another."""
    from crane_spark.streaming.pipelines import stream_incremental_ingest

    src = str(tmp_path / "crawl")
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    schema = "doc_id long, text string"

    spark.createDataFrame([(1, None), (2, "alpha")], schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    q = stream_incremental_ingest(
        spark.readStream.schema(schema).parquet(src), store, ck
    )
    q.awaitTermination(60)
    spark.createDataFrame([(3, None), (4, "beta")], schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    q = stream_incremental_ingest(
        spark.readStream.schema(schema).parquet(src), store, ck
    )
    q.awaitTermination(60)

    stored = spark.read.parquet(store)
    assert stored.filter("text IS NULL").count() == 1
    assert stored.count() == 3  # null + alpha + beta


def test_heavy_hitters_store_is_self_describing(spark, tmp_path):
    """The CMS store records its (depth, width); a reader needs no
    params (mismatched defaults would probe the wrong cells and return
    silent zeros), contradictory explicit params raise, and ingest
    refuses to append a different geometry into an existing store."""
    import pytest

    from crane_spark.streaming.pipelines import (
        read_heavy_hitters,
        stream_heavy_hitters,
    )

    src = str(tmp_path / "in")
    store = str(tmp_path / "hh")
    rows = [(f"t{k}",) for k in range(1, 6) for _ in range(30 // k)]
    spark.createDataFrame(rows, "token string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = stream_heavy_hitters(
        spark.readStream.schema("token string").parquet(src),
        store,
        str(tmp_path / "ck1"),
        width=4096,  # NOT the default
    )
    q.awaitTermination(60)

    # paramless read resolves the stored geometry and ranks correctly
    top = read_heavy_hitters(spark, store, top_n=2).collect()
    assert [r["token"] for r in top] == ["t1", "t2"]
    with pytest.raises(ValueError, match="records depth"):
        read_heavy_hitters(spark, store, width=2048)
    # a second ingest run with a different geometry must refuse
    q = stream_heavy_hitters(
        spark.readStream.schema("token string").parquet(src),
        store,
        str(tmp_path / "ck2"),
        width=2048,
    )
    with pytest.raises(Exception, match="refusing to append"):
        q.awaitTermination(60)
        raise AssertionError("query should have failed")


def test_expire_neardup_index_dedup_horizon(spark, tmp_path):
    """The band index carries an ingest_ts stamp; expire_neardup_index
    evicts entries older than the horizon so a long-expired duplicate
    is RE-ADMITTED, while in-horizon entries keep suppressing repeats.
    The doc store is untouched by the expiry."""
    import time

    from crane_spark.streaming.pipelines import (
        expire_neardup_index,
        stream_neardup_ingest,
    )

    src = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"
    base = " ".join(f"w{i}" for i in range(30))
    novel = " ".join(f"z{i}" for i in range(30))

    def run():
        q = stream_neardup_ingest(
            spark.readStream.schema(schema).parquet(src), store, ckpt
        )
        q.awaitTermination(120)

    spark.createDataFrame([(1, base), (2, novel)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()

    # horizon of 1 hour, "now" pushed 2 hours into the future: every
    # index entry ages out; the docs store must survive untouched
    now = int(time.time())
    res = expire_neardup_index(spark, store, older_than_sec=3600, now_sec=now + 7200)
    assert res["kept"] == 0 and res["evicted"] > 0
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(store + "/docs").collect()
    ) == [1, 2]

    # the expired duplicate re-admits (the horizon semantics)...
    spark.createDataFrame([(3, base)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(store + "/docs").collect()
    ) == [1, 2, 3]

    # ...and an IN-horizon expiry is a no-op that keeps suppressing
    res2 = expire_neardup_index(spark, store, older_than_sec=3600)
    assert res2["evicted"] == 0 and res2["kept"] > 0
    spark.createDataFrame([(4, base)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(store + "/docs").collect()
    ) == [1, 2, 3]


def test_compact_vector_index_bounds_file_count(spark, sf_dir, tmp_path):
    """stream_vector_ingest accretes one batch dir per micro-batch;
    compact_vector_index folds them into target_files id-deduped,
    cell-sorted files with identical read-back content, and recovers
    from a crash mid-swap."""
    import os
    import shutil

    import pyspark.sql.functions as F

    from crane_spark.streaming.pipelines import (
        compact_vector_index,
        read_vector_index,
        stream_vector_ingest,
    )
    from crane_spark.tables import table

    vecs = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = vecs.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    src = str(tmp_path / "vecs")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    # three source files -> maxFilesPerTrigger=1 gives three batch dirs
    vecs.limit(30).repartition(3).write.parquet(src)

    q = stream_vector_ingest(
        spark.readStream.option("maxFilesPerTrigger", "1").schema(
            spark.read.parquet(src).schema
        ).parquet(src),
        store,
        ckpt,
        cents,
    )
    q.awaitTermination(120)

    before = {
        (r["vec_id"], r["centroid_id"])
        for r in read_vector_index(spark, store).select(
            "vec_id", "centroid_id"
        ).collect()
    }
    n_files_before = sum(
        f.endswith(".parquet") for _, _, fs in os.walk(store) for f in fs
    )
    n = compact_vector_index(spark, store, target_files=2)
    after = {
        (r["vec_id"], r["centroid_id"])
        for r in read_vector_index(spark, store).select(
            "vec_id", "centroid_id"
        ).collect()
    }
    n_files_after = sum(
        f.endswith(".parquet") for _, _, fs in os.walk(store) for f in fs
    )
    assert after == before and n == len(before)
    assert n_files_after <= 2 < n_files_before

    # crash mid-swap: live store renamed aside, staging stranded
    os.rename(store, store + ".old")
    shutil.copytree(store + ".old", store + ".compact")
    n2 = compact_vector_index(spark, store, target_files=2)
    assert os.path.exists(store)
    assert not os.path.exists(store + ".old")
    assert not os.path.exists(store + ".compact")
    assert n2 == len(before)




@pytest.mark.parametrize("kill_point", [0, 1, 2, 3, 4])
def test_stream_training_corpus_crash_matrix(
    spark, sf_dir, tmp_path, monkeypatch, kill_point
):
    """Crash-injection soak (r7 verdict #8): kill the corpus stream
    once in EVERY gap of its per-batch commit sequence — before the
    first sink write, between each adjacent pair of the four
    idempotent sink writes (corpus, hashes, lang_counts, report), and
    after the last write but before the streaming checkpoint commit.
    After restart + full drain, the store must be indistinguishable
    from a never-crashed run over the same input: the exactly-once
    construction means every kill point resolves to pre-batch
    (replayed) or post-batch (overwritten in place), never a blend."""
    import pyspark.sql.functions as F
    from pyspark.sql.readwriter import DataFrameWriter

    from crane_spark.llm.run_pipeline import (
        read_stream_corpus,
        stream_training_corpus,
    )
    from crane_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") < 20)
    src = str(tmp_path / "src")
    root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    ref_root = str(tmp_path / "ref_store")
    ref_ckpt = str(tmp_path / "ref_ckpt")

    # two source files -> two micro-batches (maxFilesPerTrigger=1);
    # the second overlaps the first so cross-batch hash dedup is live
    docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 150)).coalesce(
        1
    ).write.mode("append").parquet(src)
    docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 250)).coalesce(
        1
    ).write.mode("append").parquet(src)

    def run(out_root, checkpoint):
        q = stream_training_corpus(
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src),
            eval_docs,
            out_root,
            checkpoint,
        )
        try:
            q.awaitTermination(180)
        except Exception:
            pass
        return q.exception()

    # reference: the never-crashed run
    assert run(ref_root, ref_ckpt) is None
    ref_corpus, ref_report = read_stream_corpus(spark, ref_root)
    ref_ids = sorted(r["doc_id"] for r in ref_corpus.collect())
    ref_stages = sorted((r["stage"], r["n_docs"]) for r in ref_report.collect())
    assert ref_ids

    # injected run: allow kill_point sink writes into `root`, then die
    # (kill_point == 4: die after the 4th write, before the commit)
    orig = DataFrameWriter.parquet
    state = {"done": 0, "armed": True}

    def crashing(self, path, *a, **kw):
        if state["armed"] and root in str(path):
            if state["done"] == kill_point and kill_point < 4:
                raise RuntimeError(f"injected crash before sink write {kill_point + 1}")
            res = orig(self, path, *a, **kw)
            state["done"] += 1
            if state["done"] == 4 and kill_point == 4:
                raise RuntimeError("injected crash after sinks, before commit")
            return res
        return orig(self, path, *a, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", crashing)
    exc = run(root, ckpt)
    assert exc is not None, "the injected crash must kill the first run"
    state["armed"] = False

    # recovery: restart on the same checkpoint, drain everything
    assert run(root, ckpt) is None
    corpus, report = read_stream_corpus(spark, root)
    got_ids = sorted(r["doc_id"] for r in corpus.collect())
    got_stages = sorted((r["stage"], r["n_docs"]) for r in report.collect())
    assert got_ids == ref_ids
    assert got_stages == ref_stages
    # no blend state: content-unique corpus, one report row per stage
    assert corpus.select(F.md5("text")).distinct().count() == len(got_ids)


@pytest.mark.parametrize("kill_point", [0, 1, 2])
def test_stream_neardup_ingest_crash_matrix(spark, tmp_path, monkeypatch, kill_point):
    """Kill the near-dup ingest once in every gap of its two-append
    commit sequence (before the bands append, between bands and docs,
    after docs before the checkpoint commit). The docstring's ordering
    argument — bands FIRST, so a crash leaves the index over-complete,
    never under-complete — must make every kill point converge after
    restart to exactly the clean run's store: same admitted docs, no
    re-appended duplicates, and a novel doc still admitted afterward."""
    from pyspark.sql.readwriter import DataFrameWriter

    from crane_spark.streaming.pipelines import stream_neardup_ingest

    src = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"
    base = " ".join(f"w{i}" for i in range(30))
    near = " ".join(f"w{i}" for i in range(29)) + " zz"  # near-dup of base
    novel = " ".join(f"z{i}" for i in range(30))

    def run():
        q = stream_neardup_ingest(
            spark.readStream.schema(schema).parquet(src), store, ckpt
        )
        try:
            q.awaitTermination(120)
        except Exception:
            pass
        return q.exception()

    spark.createDataFrame([(1, base), (2, near), (3, novel)], schema).coalesce(
        1
    ).write.mode("append").parquet(src)

    orig = DataFrameWriter.parquet
    state = {"done": 0, "armed": True}

    def crashing(self, path, *a, **kw):
        if state["armed"] and store in str(path):
            if state["done"] == kill_point and kill_point < 2:
                raise RuntimeError(f"injected crash before store write {kill_point + 1}")
            res = orig(self, path, *a, **kw)
            state["done"] += 1
            if state["done"] == 2 and kill_point == 2:
                raise RuntimeError("injected crash after both appends, before commit")
            return res
        return orig(self, path, *a, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", crashing)
    assert run() is not None, "the injected crash must kill the first run"
    state["armed"] = False

    assert run() is None
    got = sorted(r["doc_id"] for r in spark.read.parquet(store + "/docs").collect())
    assert got == [1, 3]  # near-dup 2 dropped exactly once, despite the crash

    # the recovered store still dedups new arrivals and admits novelty
    spark.createDataFrame(
        [(9, base), (10, " ".join(f"y{i}" for i in range(30)))], schema
    ).coalesce(1).write.mode("append").parquet(src)
    assert run() is None
    got2 = sorted(r["doc_id"] for r in spark.read.parquet(store + "/docs").collect())
    assert got2 == [1, 3, 10]


def test_maintenance_reads_merge_mixed_band_schemas(spark, tmp_path):
    """A band store appended to across engine versions holds parquet
    files both WITH and WITHOUT ingest_ts (the stamp landed in r8).
    Maintenance reads must take the UNION schema: expire still evicts
    stamped rows and keeps pre-stamp NULL rows even when a plain read
    would infer the schema from an old stamp-less footer, and
    compaction must never strip the stamp column from rows that have
    it (ADVICE r8 medium)."""
    import time

    from crane_spark.streaming.pipelines import (
        compact_neardup_store,
        expire_neardup_index,
    )

    now = int(time.time())

    def mk_mixed_store(root: str) -> None:
        bands = root + "/bands"
        # old-schema file FIRST so footer-order inference would
        # plausibly pick the stamp-less schema
        spark.createDataFrame(
            [(1, 0, 111)], "doc_id long, band int, band_key long"
        ).coalesce(1).write.mode("append").parquet(bands)
        spark.createDataFrame(
            [(2, 0, 222, now - 10_000), (3, 0, 333, now)],
            "doc_id long, band int, band_key long, ingest_ts long",
        ).coalesce(1).write.mode("append").parquet(bands)
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
        ).write.parquet(root + "/docs")

    # expire on a mixed store: stamped-old evicted, stamped-new kept,
    # pre-stamp NULL row kept forever
    store_a = str(tmp_path / "store_a")
    mk_mixed_store(store_a)
    res = expire_neardup_index(spark, store_a, older_than_sec=3600, now_sec=now)
    assert res == {"kept": 2, "evicted": 1}
    kept = spark.read.option("mergeSchema", "true").parquet(store_a + "/bands")
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3]
    assert "ingest_ts" in kept.columns

    # compaction on a mixed store: stamp column survives, pre-stamp
    # rows read back NULL (the documented keep-forever contract)
    store_b = str(tmp_path / "store_b")
    mk_mixed_store(store_b)
    compact_neardup_store(spark, store_b)
    after = spark.read.parquet(store_b + "/bands")
    assert "ingest_ts" in after.columns
    stamps = {r["doc_id"]: r["ingest_ts"] for r in after.collect()}
    assert stamps[1] is None
    assert stamps[2] == now - 10_000 and stamps[3] == now


def test_crash_safe_swap_merges_old_when_live_recreated(spark, tmp_path):
    """Mid-swap crash (live renamed to .old, staging never installed)
    followed by an ingest RESTART that recreates the live dir with new
    appends before maintenance runs again: the next maintenance must
    fold .old back into the rewrite instead of deleting it — the old
    recovery rmtree'd the entire pre-compaction store (ADVICE r8)."""
    import os

    from crane_spark.streaming.pipelines import (
        compact_vector_index,
        read_vector_index,
    )

    store = str(tmp_path / "store")
    schema = "vec_id long, centroid_id long, embedding array<double>"
    pre = [(i, i % 3, [float(i), 1.0]) for i in range(10)]
    spark.createDataFrame(pre, schema).write.parquet(store + "/q1/batch-0")

    # crash window: live -> .old done, then death; the restarted
    # stream's next batch recreates the live root with only its rows
    os.rename(store, store + ".old")
    post = [(i, i % 3, [float(i), 2.0]) for i in range(10, 14)]
    spark.createDataFrame(post, schema).write.parquet(store + "/q1/batch-1")

    n = compact_vector_index(spark, store, target_files=2)
    assert n == 14  # union, not just the recreated live dir
    got = sorted(
        r["vec_id"] for r in read_vector_index(spark, store).collect()
    )
    assert got == list(range(14))
    assert not os.path.exists(store + ".old")
    assert not os.path.exists(store + ".compact")


@pytest.mark.parametrize("op", ["expire", "compact_vec"])
@pytest.mark.parametrize("kill_point", [0, 1, 2])
def test_store_maintenance_swap_crash_matrix(
    spark, tmp_path, monkeypatch, op, kill_point
):
    """Crash-injection matrix for the r8 maintenance ops' two-rename
    swap (r8 verdict #7): kill once in every gap — before live->.old,
    between the two renames, and after staging->live but before the
    .old cleanup — for BOTH expire_neardup_index and
    compact_vector_index. A recovery rerun must land the store exactly
    on the never-crashed run's post-maintenance content, with no
    stranded .old/.compact dirs."""
    import os
    import shutil
    import time

    from crane_spark.streaming.pipelines import (
        compact_vector_index,
        expire_neardup_index,
    )

    now = int(time.time())
    store = str(tmp_path / "store")
    ref = str(tmp_path / "ref")

    if op == "expire":
        bands_schema = "doc_id long, band int, band_key long, ingest_ts long"
        rows = [
            (1, 0, 111, now - 10_000),  # expired
            (2, 0, 222, now),  # live
            (3, 1, 333, None),  # pre-stamp: kept forever
        ]
        for root in (store, ref):
            spark.createDataFrame(rows, bands_schema).coalesce(1).write.parquet(
                root + "/bands"
            )

        def run(root):
            expire_neardup_index(spark, root, older_than_sec=3600, now_sec=now)

        def content(root):
            return sorted(
                (r["doc_id"], r["ingest_ts"])
                for r in spark.read.parquet(root + "/bands").collect()
            )
    else:
        schema = "vec_id long, centroid_id long, embedding array<double>"
        b0 = [(i, i % 2, [float(i)]) for i in range(6)]
        b1 = [(i, i % 2, [float(i)]) for i in range(4, 9)]  # overlaps b0
        for root in (store, ref):
            spark.createDataFrame(b0, schema).write.parquet(root + "/q/batch-0")
            spark.createDataFrame(b1, schema).write.parquet(root + "/q/batch-1")

        def run(root):
            compact_vector_index(spark, root, target_files=2)

        def content(root):
            return sorted(
                (r["vec_id"], r["centroid_id"])
                for r in spark.read.option("recursiveFileLookup", "true")
                .parquet(root)
                .dropDuplicates(["vec_id"])
                .collect()
            )

    run(ref)  # the never-crashed reference

    # swap-step injection: step 0 = rename(live, .old), step 1 =
    # rename(staging, live), step 2 = rmtree(.old). Arm only for paths
    # under this test's store.
    real_rename, real_rmtree = os.rename, shutil.rmtree
    state = {"step": 0, "armed": True}

    def guard(kind):
        if state["armed"]:
            if state["step"] == kill_point:
                raise RuntimeError(f"injected crash before swap {kind}")
            state["step"] += 1

    def rename(src, dst, **kw):
        if state["armed"] and store in str(src):
            guard("rename")
        return real_rename(src, dst, **kw)

    def rmtree(path, *a, **kw):
        if state["armed"] and store in str(path):
            guard("rmtree")
        return real_rmtree(path, *a, **kw)

    monkeypatch.setattr(os, "rename", rename)
    monkeypatch.setattr(shutil, "rmtree", rmtree)
    with pytest.raises(RuntimeError, match="injected crash"):
        run(store)
    state["armed"] = False

    run(store)  # recovery rerun
    assert content(store) == content(ref)
    assert not os.path.exists(store + ".old")
    assert not os.path.exists(store + ".compact")


@pytest.mark.parametrize("kill_point", [0, 1, 2, 3, 4])
def test_store_maintenance_merge_swap_crash_matrix(
    spark, tmp_path, monkeypatch, kill_point
):
    """Crash-injection matrix for the MERGE path of the crash-safe
    swap (ADVICE r9): when maintenance starts with a stranded ``.old``
    beside a writer-recreated live dir, the fold run performs five
    os-ops — rename(.old, .merged), rename(live, .old),
    rename(.compact, live), rmtree(.old), rmtree(.merged) — and a
    crash in ANY gap must not lose the stranded .old's rows. The old
    protocol rmtree'd .old before installing staging, so a crash
    there left .old's only copy in .compact, which recovery deletes.
    A recovery rerun must land exactly on the never-crashed result
    with no stranded side dirs."""
    import glob
    import os
    import shutil

    from crane_spark.streaming.pipelines import (
        compact_vector_index,
        read_vector_index,
    )

    store = str(tmp_path / "store")
    ref = str(tmp_path / "ref")
    schema = "vec_id long, centroid_id long, embedding array<double>"
    pre = [(i, i % 3, [float(i), 1.0]) for i in range(10)]
    post = [(i, i % 3, [float(i), 2.0]) for i in range(10, 14)]
    for root in (store, ref):
        # mid-swap crash of an EARLIER maintenance: live went to .old,
        # staging never installed; the restarted stream then recreated
        # the live root with only its new batch
        spark.createDataFrame(pre, schema).write.parquet(root + ".old/q/batch-0")
        spark.createDataFrame(post, schema).write.parquet(root + "/q/batch-1")

    def run(root):
        compact_vector_index(spark, root, target_files=2)

    def content(root):
        return sorted(
            r["vec_id"] for r in read_vector_index(spark, root).collect()
        )

    run(ref)
    assert content(ref) == list(range(14))

    real_rename, real_rmtree = os.rename, shutil.rmtree
    state = {"step": 0, "armed": True}

    def guard():
        if state["step"] == kill_point:
            raise RuntimeError("injected crash in merge swap")
        state["step"] += 1

    def rename(src, dst, **kw):
        if state["armed"] and store in str(src):
            guard()
        return real_rename(src, dst, **kw)

    def rmtree(path, *a, **kw):
        if state["armed"] and store in str(path):
            guard()
        return real_rmtree(path, *a, **kw)

    monkeypatch.setattr(os, "rename", rename)
    monkeypatch.setattr(shutil, "rmtree", rmtree)
    with pytest.raises(RuntimeError, match="injected crash"):
        run(store)
    state["armed"] = False

    run(store)  # recovery rerun: folds .old/.merged leftovers
    assert content(store) == content(ref)
    assert not os.path.exists(store + ".old")
    assert not os.path.exists(store + ".compact")
    assert glob.glob(store + ".merged*") == []


def test_neardup_bloom_front_skips_probes_and_preserves_semantics(spark, tmp_path):
    """bloom_front=True must admit exactly the docs the un-fronted
    ingest admits: a novel-only batch short-circuits the stored-index
    probe (probes_skipped), an exact-duplicate batch hits the front
    and runs the probe (dropped as before), and a forced full replay
    self-collides through the front, so nothing re-appends."""
    import shutil

    from crane_spark.streaming.pipelines import stream_neardup_ingest

    src = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"
    base = " ".join(f"w{i}" for i in range(30))
    novel = " ".join(f"z{i}" for i in range(30))
    novel2 = " ".join(f"y{i}" for i in range(30))

    stats: dict = {}

    def run():
        q = stream_neardup_ingest(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src),
            store,
            ckpt,
            bloom_front=True,
            bloom_stats=stats,
        )
        q.awaitTermination(180)

    # run 1: two batches; the second's docs are all-novel, so once the
    # front seeds (index exists after batch 1) it must skip the probe
    spark.createDataFrame([(1, base), (2, novel)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()
    spark.createDataFrame([(6, novel2)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()
    assert stats["probes_skipped"] >= 1 and stats["keys_tested"] > 0

    # run 2: an exact duplicate — identical band keys, so the front
    # HITS, the probe runs, and the arrival drops
    before_runs = stats["probes_run"]
    spark.createDataFrame([(9, base)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()
    assert stats["probes_run"] > before_runs
    got = sorted(r["doc_id"] for r in spark.read.parquet(store + "/docs").collect())
    assert got == [1, 2, 6]

    # forced replay: every replayed doc self-collides through the
    # front; the store must not change
    shutil.rmtree(ckpt)
    run()
    got2 = sorted(r["doc_id"] for r in spark.read.parquet(store + "/docs").collect())
    assert got2 == [1, 2, 6]


def test_bloom_front_size_gate_disables_past_ceiling(spark, tmp_path, monkeypatch):
    """Forced-tiny-ceiling exercise of the bloom front's size gate
    (r9 verdict #1): when the planned bitmap prices past
    _BLOOM_FRONT_CEILING_BYTES, the front must AUTO-DISABLE with the
    reason recorded in bloom_stats — never allocate — and the ingest
    must keep exact un-fronted semantics: probes run (none skipped)
    and duplicates are still dropped."""
    from crane_spark.streaming import pipelines as P
    from crane_spark.streaming.pipelines import stream_neardup_ingest

    # smallest possible bitmap is 8192 bits = 1024 bytes; a 512-byte
    # ceiling forces the gate for ANY store size
    monkeypatch.setattr(P, "_BLOOM_FRONT_CEILING_BYTES", 512)

    src = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"
    base = " ".join(f"w{i}" for i in range(30))
    novel = " ".join(f"z{i}" for i in range(30))

    stats: dict = {}

    def run():
        q = stream_neardup_ingest(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src),
            store,
            ckpt,
            bloom_front=True,
            bloom_stats=stats,
        )
        q.awaitTermination(180)

    spark.createDataFrame([(1, base)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()
    # batch 2: one novel + one exact duplicate; the gated run must
    # probe (not skip) and drop the duplicate exactly like un-fronted
    spark.createDataFrame([(2, novel), (3, base)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()

    assert stats.get("disabled") == "bitmap over ceiling"
    assert stats["probes_skipped"] == 0
    got = sorted(r["doc_id"] for r in spark.read.parquet(store + "/docs").collect())
    assert got == [1, 2]


def test_bloom_front_plan_prices_without_allocating():
    """_BloomFront.plan must agree with __init__'s actual layout so
    the gate's price is the real allocation, and the 10B-key case the
    r9 verdict named must price past the default 256 MB ceiling."""
    from crane_spark.streaming.pipelines import (
        _BLOOM_FRONT_CEILING_BYTES,
        _BloomFront,
    )

    for n, fpp in ((1, 0.03), (10_000, 0.03), (5_000_000, 0.01)):
        front = _BloomFront(n, fpp)
        assert (front.n_bits, front.k) == _BloomFront.plan(n, fpp)

    n_bits, _ = _BloomFront.plan(10_000_000_000, 0.03)
    assert n_bits // 8 > _BLOOM_FRONT_CEILING_BYTES
