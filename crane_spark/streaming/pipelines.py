"""Structured Streaming pipelines.

The reference's whole runtime is a micro-batch streaming engine with
at-least-once replay (SURVEY.md §1.3, §2.1 op L): root batches are
re-emitted after 40 s until acked, and the master dedups stale acks by
timestamp. Everything in this module replaces that machinery with
checkpointed Structured Streaming — exactly-once, no custom code:

* batch/stream parity: each pipeline applies the SAME transform
  functions used by the batch queries (operators.topology), so the
  logical plan — and therefore the result — is identical under
  ``trigger(availableNow=True)``.
* ``availableNow`` is the drain-a-file-as-a-stream semantics of the
  reference's spout (read to EOF, then finish), with batch sizing
  via maxFilesPerTrigger instead of CRANE_BATCH_SIZE=500.
* watermarks + windows / dropDuplicates / stream-static joins are the
  gap-fill streaming surface the reference lacks.

State-store sizing note for 100 TB streams: keyed state (windows,
dedup) lives in the state store partitioned by
spark.sql.shuffle.partitions; watermarks bound its growth — every
stateful pipeline here REQUIRES a watermark for that reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from crane_spark.functions.aggregates import dsum
from crane_spark.operators.topology import global_filter_count, wordcount


def stream_wordcount(lines: DataFrame) -> DataFrame:
    """Streaming WordCount over a text-line stream (ops A-D as a
    stateful streaming aggregation; use outputMode('complete') to a
    memory/console sink, matching the master's final print)."""
    return wordcount(lines)


def stream_global_filter_count(df: DataFrame, predicate) -> DataFrame:
    """Streaming TwitterUserFilter (ops E-F)."""
    return global_filter_count(df, predicate)


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling event-time window with a watermark: late rows beyond
    the watermark are dropped and window state is evicted — the
    late-data story the reference doesn't have. Pass ``slide`` shorter
    than ``window`` for SLIDING (hopping) windows: each event then
    lands in window/slide overlapping buckets, state still bounded by
    the watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide or window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_dedup_with_watermark(
    events: DataFrame,
    keys: list[str],
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon
    (dropDuplicates keeps state only until the watermark passes)."""
    return events.withWatermark(ts_col, watermark).dropDuplicates([*keys, ts_col])


def stream_static_enrich(stream: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Stream-static join: the static side is re-read per micro-batch
    and broadcast (dimension enrichment at stream speed)."""
    return stream.join(F.broadcast(dim), on, how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "1 hour",
    within: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: right rows join left rows
    with the same key whose timestamp falls in
    ``[right_ts, right_ts + within]``. Both sides carry watermarks so
    the join state is evictable — unbounded state is the failure mode
    of stream-stream joins at scale, and the time-bound + watermark is
    what bounds it."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (lw[left_ts] >= rw[right_ts])
        & (lw[left_ts] <= rw[right_ts] + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, "inner")


def stream_to_parquet(
    df: DataFrame, path: str, checkpoint: str, available_now: bool = True
) -> StreamingQuery:
    """Durable exactly-once sink: parquet + checkpoint (replaces the
    reference's XOR-ack + replay, SURVEY.md §2.1 op L)."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_upsert_parquet(
    df: DataFrame, path: str, checkpoint: str, key_cols: list[str]
) -> StreamingQuery:
    """foreachBatch upsert sink: each micro-batch replaces existing
    rows for its keys (read-anti-join-union-overwrite on parquet; on a
    real deployment the same foreachBatch body targets Delta/Iceberg
    MERGE). This is the 'iterative/merge sink' surface from SURVEY §2.2
    that plain append sinks can't express."""
    import os

    def upsert(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.dropDuplicates(key_cols)
        if os.path.exists(path):
            existing = spark.read.parquet(path)
            keep = existing.join(batch.select(*key_cols), key_cols, "left_anti")
            merged = keep.unionByName(batch)
        else:
            merged = batch
        # Write to a staging dir then swap: overwriting the parquet we
        # are reading in the same job would corrupt it.
        staging = path + ".staging"
        merged.write.mode("overwrite").parquet(staging)
        final = spark.read.parquet(staging)
        final.write.mode("overwrite").parquet(path)

    return (
        df.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def run_available_now(
    df: DataFrame,
    sink_table: str,
    output_mode: str = "complete",
    checkpoint: str | None = None,
    timeout_sec: int = 120,
) -> None:
    """Drain the stream to completion into an in-memory table (the
    console/memory sink twin of the reference's final result print,
    crane_master.py:166-169)."""
    writer = (
        df.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    query = writer.start()
    try:
        query.awaitTermination(timeout_sec)
    finally:
        if query.isActive:
            query.stop()


def stream_stream_outer_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    within: str = "30 minutes",
    how: str = "leftOuter",
) -> DataFrame:
    """Watermarked stream-stream OUTER join (left or full): matched
    pairs emit like the inner join; an unmatched row emits once with
    nulls — but only after the watermark passes its join bound (before
    that, a match could still arrive), which is why outer results
    trail the data by watermark + within. Both the time-bound and the
    watermark are mandatory here: they are what lets Spark ever
    declare a row unmatchable and evict it. ``how="fullOuter"`` adds
    the symmetric right-side null emission."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, how)


def stream_dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """dropDuplicatesWithinWatermark: dedup on business keys ALONE
    (no timestamp in the key — two occurrences with different event
    times still collapse), with state evicted once the watermark
    passes. This is the at-least-once-source cleaner: a replayed event
    whose retry carries a slightly different timestamp would survive
    plain dropDuplicates(keys + ts) but is removed here."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_incremental_ingest(
    docs: DataFrame,
    store_path: str,
    checkpoint: str,
    text_col: str = "text",
) -> StreamingQuery:
    """Incremental corpus ingestion (the daily-crawl append): each
    micro-batch is deduped WITHIN itself and against everything already
    ingested (content hash anti-join), and only novel documents append
    to the store — dedup holds across batches AND across runs, with
    exactly-once delivery from the checkpoint.

    At 100 TB the `known` side becomes a bucketed hash-only table (one
    narrow column, pruned scan) fronted by a Bloom filter
    (operators/bloom.py) so the per-batch probe never rescans the
    corpus; the foreachBatch body is unchanged."""
    import os

    from pyspark.sql import functions as F  # noqa: F811 (local for closure)

    def ingest(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        hashed = batch.withColumn("text_hash", F.sha2(F.col(text_col), 256))
        hashed = hashed.dropDuplicates(["text_hash"])
        if os.path.exists(store_path):
            known = spark.read.parquet(store_path).select("text_hash")
            hashed = hashed.join(known, "text_hash", "left_anti")
        hashed.write.mode("append").parquet(store_path)

    return (
        docs.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
