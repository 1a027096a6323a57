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

from pyspark.sql import DataFrame, SparkSession
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
    rows for its keys (read-anti-join-union, staged write, RENAME
    swap on parquet; on a real deployment the same foreachBatch body
    targets Delta/Iceberg MERGE). This is the 'iterative/merge sink'
    surface from SURVEY §2.2 that plain append sinks can't express.

    Crash-safety is the same rename discipline as
    :func:`compact_neardup_store`: the merged store is written ONCE to
    a staging dir and installed via two metadata-only renames
    (live -> .old, staging -> live), so the live store is never a
    half-written overwrite target — a crash at any point leaves either
    the old or the new version recoverable, and the next batch (or a
    checkpoint replay of this one) restores a stranded ``.old``
    before merging. Key equality in the anti-join is NULL-SAFE,
    matching dropDuplicates' NULLs-are-equal semantics, so NULL-keyed
    rows upsert instead of duplicating forever."""
    import os
    import shutil

    def upsert(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.dropDuplicates(key_cols)
        staging, old = path + ".staging", path + ".old"
        # recover from a crashed swap: live gone but .old present
        if not os.path.exists(path) and os.path.exists(old):
            os.rename(old, path)
        for stale in (staging, old):
            if os.path.exists(stale):
                shutil.rmtree(stale)
        if os.path.exists(path):
            existing = spark.read.parquet(path)
            bk = batch.select(*key_cols)
            cond = None
            for k in key_cols:
                c = existing[k].eqNullSafe(bk[k])
                cond = c if cond is None else cond & c
            keep = existing.join(bk, cond, "left_anti")
            merged = keep.unionByName(batch)
        else:
            merged = batch
        merged.write.mode("overwrite").parquet(staging)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(staging, path)
        if os.path.exists(old):
            shutil.rmtree(old)

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
    crane_master.py:166-169). Raises ``TimeoutError`` when the drain
    does not finish within ``timeout_sec`` — returning normally there
    would hand the caller a partially-drained table that silently
    reads as complete results."""
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
        finished = query.awaitTermination(timeout_sec)
        if not finished:
            raise TimeoutError(
                f"availableNow drain into {sink_table!r} still running "
                f"after {timeout_sec}s — the memory table is PARTIAL; "
                "raise timeout_sec or reduce the input"
            )
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
            # NULL-SAFE anti-join: sha2(NULL) is NULL, and a plain
            # equality anti-join never matches NULL keys — a null-text
            # doc would re-append on EVERY batch and on every replay,
            # breaking the cross-run dedup contract (dropDuplicates
            # above already treats NULLs as equal; the probe must too).
            known = spark.read.parquet(store_path).select(
                F.col("text_hash").alias("_known_hash")
            )
            hashed = hashed.join(
                known,
                F.col("text_hash").eqNullSafe(F.col("_known_hash")),
                "left_anti",
            )
        hashed.write.mode("append").parquet(store_path)

    return (
        docs.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


class _BloomFront:
    """Driver-side Bloom filter over the STORED band keys — the
    optional probe front for `stream_neardup_ingest(bloom_front=True)`.

    Direction of error: a false POSITIVE costs one unnecessary index
    probe (the exact join then finds nothing); a false NEGATIVE would
    skip a probe that had a real collision and re-admit a duplicate —
    so the filter must contain every stored key. It does, given the
    store's documented single-writer rule: seeded from the full index
    at run start (one distributed pass over the narrow band_key
    column, partial bitmaps OR-folded on the driver) and updated with
    each batch's appended keys after their append commits. A crash
    re-seeds on restart; there is no persisted filter to drift.

    Hashing is deterministic double hashing over two Spark-side
    xxhash64 values of the key (h1 + i*h2 mod n_bits), so executors
    and driver never disagree on a key's bits."""

    @staticmethod
    def plan(n_items: int, fpp: float) -> tuple[int, int]:
        """(n_bits, k) for a target item count and fpp — separated
        from __init__ so the size GATE can price the bitmap BEFORE
        allocating it (the anchor-broadcast-ceiling pattern,
        llm/graph_ann.py)."""
        import math

        n = max(1024, int(n_items))
        ideal = int(-n * math.log(fpp) / (math.log(2) ** 2))
        n_bits = max(8192, 1 << (ideal - 1).bit_length())
        k = max(1, round(n_bits / n * math.log(2)))
        return n_bits, k

    def __init__(self, n_items: int, fpp: float):
        import numpy as np

        self.n_bits, self.k = self.plan(n_items, fpp)
        self.bits = np.zeros(self.n_bits // 8, dtype=np.uint8)

    @staticmethod
    def fill(buf, h1, h2, n_bits: int, k: int) -> None:
        """Set the bits for hash-pair arrays into ``buf`` (uint8
        bitmap) — shared by driver add() and the executor-side
        seeding partials so both use one bit layout."""
        import numpy as np

        h1 = h1.astype(np.uint64)
        h2 = h2.astype(np.uint64)
        for i in range(k):
            idx = ((h1 + np.uint64(i) * h2) % np.uint64(n_bits)).astype(
                np.int64
            )
            np.bitwise_or.at(
                buf, idx >> 3, np.left_shift(np.uint8(1), (idx & 7).astype(np.uint8))
            )

    def add(self, h1, h2) -> None:
        self.fill(self.bits, h1, h2, self.n_bits, self.k)

    def might_contain_any(self, h1, h2) -> bool:
        import numpy as np

        if len(h1) == 0:
            return False
        h1 = h1.astype(np.uint64)
        h2 = h2.astype(np.uint64)
        alive = np.ones(len(h1), dtype=bool)
        for i in range(self.k):
            idx = ((h1 + np.uint64(i) * h2) % np.uint64(self.n_bits)).astype(
                np.int64
            )
            alive &= (
                (self.bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
            ).astype(bool)
            if not alive.any():
                return False
        return True


def _bloom_hash_cols(key_col: str = "band_key"):
    """The two deterministic 64-bit key hashes the front is built on;
    computed Spark-side so seeding partials and driver tests agree."""
    return [
        F.xxhash64(key_col).alias("h1"),
        F.xxhash64(F.lit(1), F.col(key_col)).alias("h2"),
    ]


# Hard ceiling on the bloom front's bitmap (driver copy AND each
# seeding task's partial are this size). Past it the front is
# AUTO-DISABLED with a logged reason — the front is purely a probe
# short-circuit, so correctness is identical without it; silently
# allocating a multi-GB bitmap per 10^10-key store (~9 GB at fpp
# 0.03) would instead fail as an opaque OOM inside mapInPandas.
# Remedies past the ceiling: raise bloom_fpp (fewer bits/key), expire
# the index (`expire_neardup_index` shrinks the keyed set), or accept
# the un-fronted probe path. Env override for tests/operators.
_BLOOM_FRONT_CEILING_BYTES = int(
    __import__("os").environ.get("CRANE_BLOOM_FRONT_CEILING_BYTES", 256 << 20)
)


def _seed_bloom_front(
    spark,
    index_store: str,
    fpp: float,
    key_col: str = "band_key",
    recursive: bool = False,
) -> _BloomFront | None:
    """Build the run's front from the persisted index: one count + one
    distributed pass over the narrow ``key_col`` column, each partition
    emitting a partial bitmap, OR-folded driver-side via
    toLocalIterator (driver peak = the front + ONE partial, never all
    partials at once). Returns None — front disabled — when the
    planned bitmap exceeds `_BLOOM_FRONT_CEILING_BYTES`.

    ``recursive`` reads per-(query, batch) subdirectory stores (the
    corpus hash ledger's layout)."""
    import logging

    import numpy as np

    reader = spark.read.option("mergeSchema", "true")
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    idx = reader.parquet(index_store)
    n = idx.count()
    n_bits, k = _BloomFront.plan(4 * n + 100_000, fpp)
    if n_bits // 8 > _BLOOM_FRONT_CEILING_BYTES:
        logging.getLogger(__name__).warning(
            "bloom front DISABLED: planned bitmap %d MB for %d stored "
            "band keys at fpp=%g exceeds the %d MB ceiling "
            "(CRANE_BLOOM_FRONT_CEILING_BYTES). Remedies: raise "
            "bloom_fpp, expire the index, or run un-fronted.",
            n_bits // 8 >> 20,
            n,
            fpp,
            _BLOOM_FRONT_CEILING_BYTES >> 20,
        )
        return None
    front = _BloomFront(4 * n + 100_000, fpp)
    hashed = idx.select(*_bloom_hash_cols(key_col))

    def gen(batches):
        import numpy as np
        import pandas as pd

        part = np.zeros(n_bits // 8, dtype=np.uint8)
        for pdf in batches:
            if len(pdf):
                _BloomFront.fill(
                    part, pdf["h1"].to_numpy(), pdf["h2"].to_numpy(), n_bits, k
                )
        yield pd.DataFrame({"bits": [part.tobytes()]})

    for r in hashed.mapInPandas(gen, "bits binary").toLocalIterator():
        front.bits |= np.frombuffer(r["bits"], dtype=np.uint8)
    return front


def stream_neardup_ingest(
    docs: DataFrame,
    store_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    t_num: int = 1,
    t_den: int = 2,
    bloom_front: bool = False,
    bloom_fpp: float = 0.03,
    bloom_stats: dict | None = None,
) -> StreamingQuery:
    """Incremental NEAR-duplicate-free corpus ingestion: the streaming
    MinHash-LSH twin of `stream_incremental_ingest`'s exact-hash
    dedup. Each micro-batch:

    1. computes LSH band keys for its documents (llm/dedup.py: one
       codegen'd hash-agg, #bands short rows per doc);
    2. drops within-batch near-dups (band-bucket candidates verified
       by exact shingle Jaccard >= t; keeper policy is the order-free
       "dominated by ANY lower id" rule shared with
       `llm.similarity.semantic_dedup_keep` — NOT sequential greedy: a
       doc that matches a lower-id doc is dropped even when that lower
       doc is itself dropped, so a transitive chain A~B~C (A!~C) keeps
       only A, and admission can depend on where micro-batch
       boundaries fall. The rule is deterministic and fully parallel,
       which is what corpus-scale ingest needs; sequential greedy
       would serialize the batch);
    3. probes the PERSISTED band index (equi-join on (band, band_key)
       — touches only colliding buckets, never the corpus), fetches
       just the candidate matches' stored texts, verifies exactly,
       and drops matched arrivals;
    4. appends survivors to the store and their bands to the index.

    Near-dup detection therefore holds across batches AND runs, with
    retry idempotence for free: a replayed batch collides with its own
    stored bands and self-verifies at J=1, so re-appends never happen
    — the at-least-once-to-exactly-once argument the reference made
    with XOR acks (crane_master.py:86-94), rebuilt on content.

    Documents with fewer than `shingle_n` tokens have NO shingles and
    therefore no bands; they take an EXACT-hash path instead: their
    band row is (band=-1, band_key=md5(text)), within-batch dedup is
    min-id-per-hash, and the cross-run probe matches on the hash but
    only drops an arrival whose matched id actually EXISTS in the doc
    store (guarding the crash window where bands committed but docs
    did not). Bands are written BEFORE docs so that a crash between
    the two appends leaves the index over-complete (harmless — the
    replay's doc-store check resolves it) rather than under-complete
    (which would let a replayed short doc re-append).

    At 100 TB: the band index is (band, band_key, id) — narrow rows,
    bucketable on band_key so the per-batch probe is a pruned scan;
    verification reads only candidate-matched documents.

    ``bloom_front=True`` (TUNING.md state-growth audit: the
    novel-heavy-stream knob) fronts step 3 with a per-RUN driver-side
    Bloom filter over the stored band keys (`_BloomFront`): each
    batch's candidate keys (batch-bounded, collected as two 64-bit
    hashes per key) are tested first, and when NONE can be in the
    index — the common case when arrivals are mostly novel — the
    stored-index read, probe join, and verify round-trip are skipped
    outright. False positives cost one wasted probe; false negatives
    cannot occur under the store's single-writer rule (seeded from
    the full index at run start, updated after each batch's append,
    re-seeded on restart). ``bloom_stats`` (optional dict) receives
    probes_skipped / probes_run / keys_tested counters for
    observability and the TUNING.md measurement.
    """
    from crane_spark.llm.dedup import (
        minhash_bands,
        minhash_signatures,
        shingle_sets,
        tokens,
    )

    docs_store = store_path + "/docs"
    index_store = store_path + "/bands"
    # per-run bloom front state (lazily seeded at the first batch so a
    # store created mid-run still seeds correctly) and its counters
    _front: dict = {"bloom": None, "disabled": False}
    if bloom_stats is not None:
        bloom_stats.setdefault("probes_skipped", 0)
        bloom_stats.setdefault("probes_run", 0)
        bloom_stats.setdefault("keys_tested", 0)

    def _verified_pairs(spark, pairs, sets_a, sets_b):
        """Exact Jaccard >= t_num/t_den check for candidate id pairs;
        sets_* are (id, sh) shingle-set frames for each side."""
        j = (
            pairs.join(
                sets_a.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")),
                "id_a",
            ).join(
                sets_b.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")),
                "id_b",
            )
        )
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        return j.filter(F.lit(t_den) * inter >= F.lit(t_num) * union).select(
            "id_a", "id_b"
        )

    def ingest(batch: DataFrame, _batch_id: int) -> None:
        import os

        spark = batch.sparkSession
        ball = batch.dropDuplicates([id_col]).localCheckpoint(eager=True)
        # Split on shingle-ability: short docs (< shingle_n tokens)
        # have no bands and take the exact-hash path below. NULL text
        # routes to the short path too (size(NULL tokens) is NULL, so
        # without the coalesce BOTH filters would silently drop the
        # row — invisible data loss); its hash coalesces NULL to '',
        # deliberately deduping NULL-text against empty-text docs.
        n_toks = F.coalesce(F.size(tokens(text_col)), F.lit(0))
        b = ball.filter(n_toks >= shingle_n)
        short = (
            ball.filter(n_toks < shingle_n)
            .withColumn("_h", F.md5(F.coalesce(F.col(text_col), F.lit(""))))
            .localCheckpoint(eager=True)
        )
        sets = shingle_sets(b, text_col, id_col, shingle_n).localCheckpoint(eager=True)
        bands = minhash_bands(
            minhash_signatures(b, text_col, id_col, shingle_n), id_col
        ).localCheckpoint(eager=True)

        # (2) within-batch: bucket pair-gen, exact verify, drop higher id
        buckets = bands.groupBy("band", "band_key").agg(
            F.sort_array(F.collect_list(id_col)).alias("ids")
        )
        cand = (
            buckets.filter(F.size("ids") > 1)
            .select(
                F.explode(
                    F.expr(
                        "flatten(transform(ids, (x, i) -> "
                        "transform(slice(ids, i + 2, size(ids) - i - 1), "
                        "y -> struct(x AS id_a, y AS id_b))))"
                    )
                ).alias("p")
            )
            .select("p.id_a", "p.id_b")
            .distinct()
        )
        dropped = (
            _verified_pairs(spark, cand, sets, sets)
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )
        keep = b.join(dropped, id_col, "left_anti")

        # (2b) within-batch short docs: exact dedup, min-id keeper
        keep_short = short.join(
            short.groupBy("_h").agg(F.min(id_col).alias(id_col)),
            [id_col, "_h"],
            "left_semi",
        )

        # (3) against the persisted index: probe colliding buckets
        # only. Bands are written before docs, so the index can exist
        # while the doc store does not (crash between the appends) —
        # an absent doc store means nothing is truly ingested and
        # every index hit must resolve to "not stored, keep".
        store_live = os.path.exists(index_store) and os.path.exists(docs_store)
        probe_possible = True
        if bloom_front and store_live and not _front["disabled"]:
            if _front["bloom"] is None:
                _front["bloom"] = _seed_bloom_front(spark, index_store, bloom_fpp)
                if _front["bloom"] is None:
                    # size-gated: the store's key count prices the
                    # bitmap past the ceiling — run un-fronted for the
                    # rest of this run (the store only grows)
                    _front["disabled"] = True
                    if bloom_stats is not None:
                        bloom_stats["disabled"] = "bitmap over ceiling"
        if (
            bloom_front
            and store_live
            and not _front["disabled"]
            and _front["bloom"] is not None
        ):
            keys = (
                bands.join(keep.select(id_col), id_col, "left_semi")
                .select("band_key")
                .union(keep_short.select(F.col("_h").alias("band_key")))
                .distinct()
                .select(*_bloom_hash_cols())
                .toPandas()
            )
            probe_possible = _front["bloom"].might_contain_any(
                keys["h1"].to_numpy(), keys["h2"].to_numpy()
            )
            if bloom_stats is not None:
                bloom_stats["keys_tested"] += len(keys)
                key = "probes_run" if probe_possible else "probes_skipped"
                bloom_stats[key] += 1
        if store_live and probe_possible:
            idx = spark.read.parquet(index_store)
            hits = (
                bands.join(keep.select(id_col), id_col, "left_semi")
                .join(
                    idx.select(
                        "band", "band_key", F.col(id_col).alias("id_b")
                    ),
                    ["band", "band_key"],
                )
                .select(F.col(id_col).alias("id_a"), "id_b")
                .distinct()
            )
            old_docs = spark.read.parquet(docs_store).join(
                hits.select(F.col("id_b").alias(id_col)).distinct(), id_col, "left_semi"
            )
            old_sets = shingle_sets(old_docs, text_col, id_col, shingle_n)
            matched = (
                _verified_pairs(spark, hits, sets, old_sets)
                .select(F.col("id_a").alias(id_col))
                .distinct()
            )
            keep = keep.join(matched, id_col, "left_anti")

            # short docs: hash hit is proof of duplication IF the
            # matched doc really exists in the store (bands may be
            # over-complete after a bands-committed/docs-crashed run)
            stored_ids = spark.read.parquet(docs_store).select(id_col)
            short_hits = (
                short.select(F.col(id_col), F.col("_h").alias("band_key"))
                .join(
                    idx.filter(F.col("band") == F.lit(-1)).select(
                        "band_key", F.col(id_col).alias("id_b")
                    ),
                    "band_key",
                )
                .join(
                    stored_ids.select(F.col(id_col).alias("id_b")),
                    "id_b",
                    "left_semi",
                )
                .select(id_col)
                .distinct()
            )
            keep_short = keep_short.join(short_hits, id_col, "left_anti")

        keep = keep.localCheckpoint(eager=True)
        keep_short = keep_short.localCheckpoint(eager=True)

        try:
            # Bands FIRST (index over-complete on crash, never under-):
            new_bands = bands.join(
                keep.select(id_col), id_col, "left_semi"
            ).unionByName(
                keep_short.select(
                    F.col(id_col),
                    F.lit(-1).alias("band"),
                    F.col("_h").alias("band_key"),
                )
            )
            # ingest_ts (epoch seconds, stamped driver-side per batch)
            # is operational metadata for `expire_neardup_index`'s
            # dedup-horizon retention; nothing on the probe path reads
            # it, and pre-stamp stores (rows where it reads back NULL)
            # are treated as keep-forever by expire.
            import time as _time

            new_bands = new_bands.withColumn(
                "ingest_ts", F.lit(int(_time.time()))
            )
            # Front-update key collection runs BEFORE the appends
            # (ADVICE r9): a Spark failure HERE aborts the batch before
            # anything commits, so the front can never lag a committed
            # append. After the appends only a pure-numpy add() remains
            # — and if even that fails, the front resets to None so the
            # next batch re-seeds from the store (superset restored)
            # instead of silently carrying false negatives.
            kb = None
            if bloom_front and _front["bloom"] is not None:
                kb = (
                    new_bands.select("band_key")
                    .distinct()
                    .select(*_bloom_hash_cols())
                    .toPandas()
                )
            new_bands.write.mode("append").parquet(index_store)
            keep.unionByName(keep_short.drop("_h")).write.mode("append").parquet(
                docs_store
            )
            if kb is not None:
                try:
                    _front["bloom"].add(
                        kb["h1"].to_numpy(), kb["h2"].to_numpy()
                    )
                except Exception:
                    _front["bloom"] = None  # re-seed from the store
        finally:
            # free this batch's staged copies whether or not the sinks
            # succeeded — a failed write is retried by foreachBatch
            # with SIX fresh checkpoints, so leaking the failed
            # attempt's copies is exactly the accumulation pattern the
            # release exists to prevent (ADVICE r3)
            from crane_spark.operators.caching import release_local_checkpoint

            for staged in (keep, keep_short, bands, sets, short, ball):
                release_local_checkpoint(staged)

    return (
        docs.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _streaming_query_id(checkpoint: str) -> str:
    """The StreamingQuery's stable id from the checkpoint's `metadata`
    file (written at query start, BEFORE batch 0; preserved across
    restarts on the same checkpoint, regenerated if the checkpoint is
    lost). This is the txn-scoping id Delta calls `txnAppId`."""
    import json as _json
    import os

    meta = os.path.join(checkpoint.removeprefix("file:"), "metadata")
    with open(meta) as fh:
        return _json.load(fh)["id"]


def stream_append_idempotent(
    df: DataFrame, path: str, checkpoint: str
) -> StreamingQuery:
    """foreachBatch parquet sink with EXACTLY-ONCE batch application:
    micro-batch N writes `mode("overwrite")` into its own directory
    `data/<queryId>/batch-N`, so a replayed batch (crash between the
    data write and the checkpoint commit re-runs it) REPLACES its own
    previous output instead of appending next to it — idempotence by
    construction, with no atomicity gap between a data append and a
    ledger append (there is no ledger on the correctness path).

    A marker file `ledger/<queryId>-N.done` (tmp + atomic rename) is
    written after the commit purely as a FAST-PATH: a replayed batch
    whose marker exists skips recompute entirely. The check is one
    O(1) filesystem stat — never a scan of committed-batch history —
    so a year-long stream pays the same per-batch cost as batch 0.

    Scoping by queryId (read from the checkpoint metadata, the id
    Delta calls txnAppId) means a REBUILT checkpoint — whose batch ids
    restart at 0 but whose batch 0 may now contain different data —
    never trusts stale state: it writes under a fresh queryId subdir.
    The failure direction after checkpoint loss is therefore
    at-least-once (re-delivery, visible duplicates across queryIds),
    never silent data loss. Read the sink with
    `read_idempotent_sink`, which recurses into the per-batch dirs.

    Contrast with `stream_to_parquet` (Spark's parquet sink has its
    own WAL/manifest) — this pattern is for destinations Spark doesn't
    manage itself."""
    import os

    data_dir = path + "/data"
    ledger_dir = path + "/ledger"

    def append_once(batch: DataFrame, batch_id: int) -> None:
        qid = _streaming_query_id(checkpoint)
        marker = os.path.join(ledger_dir, f"{qid}-{batch_id}.done")
        if os.path.exists(marker):
            return  # replayed batch: already fully applied
        batch.write.mode("overwrite").parquet(
            os.path.join(data_dir, qid, f"batch-{batch_id}")
        )
        os.makedirs(ledger_dir, exist_ok=True)
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            fh.write("")
        os.rename(tmp, marker)  # atomic on POSIX

    return (
        df.writeStream.foreachBatch(append_once)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_idempotent_sink(spark: SparkSession, path: str) -> DataFrame:
    """Read everything `stream_append_idempotent` committed (all query
    ids, all batches): per-batch subdirectories need a recursive file
    listing, which stays a planning-time metadata operation."""
    return spark.read.option("recursiveFileLookup", "true").parquet(path + "/data")


def stream_vector_ingest(
    vectors: DataFrame,
    store_path: str,
    checkpoint: str,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> StreamingQuery:
    """Incremental IVF vector-index ingestion: each micro-batch of
    arriving embeddings is assigned to its nearest centroid (broadcast
    pass, llm/similarity.ivf_assign) and appended to the index store
    as (id, centroid_id, vector) rows, sorted by cell within each
    file so a probe scan prunes on parquet row-group stats. The
    centroid set is FROZEN at ingest start (standard IVF practice:
    retrain centroids offline, re-index under a new store), so every
    batch's assignment is consistent with every other's.

    Exactly-once by construction: batch N overwrites its own
    `<queryId>/batch-N` subdirectory (the `stream_append_idempotent`
    pattern), and `read_vector_index` dedups on id as a final guard
    for the cross-queryId re-delivery after checkpoint loss.

    Serving is `ivf_probe_topk(..., assigned=...)` over the read-back
    store — the assignment computed at ingest is REUSED, so query
    time pays only centroid-probe + in-cell re-rank. At 100 TB the
    store becomes a table partitioned/bucketed by centroid_id; the
    foreachBatch body is unchanged."""
    import os

    from crane_spark.llm.similarity import ivf_assign

    cents = centroids.localCheckpoint(eager=True)

    def ingest(batch: DataFrame, batch_id: int) -> None:
        qid = _streaming_query_id(checkpoint)
        b = batch.dropDuplicates([id_col])
        assigned = ivf_assign(b, cents, vec_col, id_col).select(
            id_col, "centroid_id"
        )
        (
            b.join(assigned, id_col)
            .select(id_col, "centroid_id", vec_col)
            .sortWithinPartitions("centroid_id")
            .write.mode("overwrite")
            .parquet(os.path.join(store_path, qid, f"batch-{batch_id}"))
        )

    return (
        vectors.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_vector_index(
    spark: SparkSession, store_path: str, id_col: str = "vec_id"
) -> DataFrame:
    """The accumulated (id, centroid_id, vector) index across every
    ingest batch and run; id-deduped so re-delivery after checkpoint
    loss can never double-count a vector."""
    return (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(store_path)
        .dropDuplicates([id_col])
    )


def compact_neardup_store(
    spark: SparkSession,
    store_path: str,
    target_files: int = 4,
    id_col: str = "doc_id",
) -> dict[str, int]:
    """Periodic maintenance for `stream_neardup_ingest`'s two stores:
    the band index accretes duplicate rows across crash replays (bands
    are written BEFORE docs, so a replayed batch re-appends its band
    rows — harmless for dedup semantics, pure bloat), and both stores
    accumulate one small file per micro-batch. Rewrite each as
    `target_files` files with the index row-deduplicated. `id_col`
    must match the ingest's id column (default ``doc_id``).

    Crash-safe swap: the compacted copy is staged, then installed via
    two renames (live -> .old, staging -> live) before the old copy is
    deleted — the store is always present under its own name except
    during the metadata-only renames, so a crash at any point leaves
    either the old or the new version readable (a stranded ``.old`` /
    ``.compact`` dir is cleaned up on the next run). Returns row
    counts per store; safe to run between ingest runs."""
    import os

    out: dict[str, int] = {}
    for name, dedup_cols in (("bands", ["band", "band_key", id_col]), ("docs", None)):
        path = os.path.join(store_path, name)

        def rewrite(df: DataFrame, cols=dedup_cols) -> DataFrame:
            return df.dropDuplicates(cols) if cols else df

        n = _crash_safe_rewrite(spark, path, rewrite, target_files)
        if n is not None:
            out[name] = n
    return out


def _crash_safe_rewrite(
    spark: SparkSession,
    path: str,
    transform,
    target_files: int,
    recursive: bool = False,
) -> int | None:
    """Rewrite the parquet dir at ``path`` as ``transform(df)`` in
    ``target_files`` files, installed via the two-rename swap (live ->
    .old, staging -> live) so the dir is always readable except during
    the metadata-only renames. Recovers a previous crashed swap
    (stranded ``.old``/``.compact``) first. Returns the rewritten row
    count, or None if the dir does not exist. Single-writer: run only
    while no stream is appending to ``path``.

    Two recovery/read hardenings (ADVICE r8):

    * Reads use ``mergeSchema`` — these stores gain operational columns
      over time (``ingest_ts`` landed in r8), so a store appended to
      across versions holds mixed parquet schemas. A plain read may
      infer the schema from an OLD footer, which would make
      `expire_neardup_index` silently keep everything and — worse —
      let a subsequent compaction rewrite the store WITHOUT the column,
      permanently stripping stamps from rows that had them. With
      mergeSchema the union schema wins and pre-stamp rows read back
      NULL, exactly the documented retention contract.
    * If BOTH the live dir and ``.old`` exist, a crash landed between
      the two renames and a restarted ingest recreated the live dir
      (its appends only) before this maintenance ran. Deleting ``.old``
      then — the pre-crash behavior — would discard the entire
      pre-maintenance store. Instead ``.old`` is FOLDED into the
      rewrite input; exact-duplicate rows across the two dirs (the
      same row seen pre- AND post-crash) are the merge's own artifact,
      so the merged input is full-row deduplicated before the
      transform — every store routed through here treats identical
      rows as one (band bloat rows, id-unique docs/vectors).

    Crucially (ADVICE r9), the folded ``.old`` is never deleted before
    the new store is installed: recovery unconditionally deletes
    staging, so between "rmtree(.old)" and "rename(staging, live)" the
    staging dir would hold the ONLY copy of .old's rows and a crash
    there loses them. Instead ``.old`` is renamed aside to
    ``.merged*`` (glob-numbered: a crash-after-install leftover can
    coexist with a fresh fold) and deleted only after
    ``rename(staging, live)`` lands; recovery folds any stranded
    ``.merged*`` dir into the inputs exactly like ``.old``."""
    import glob as _glob
    import os
    import shutil

    old = path + ".old"
    staging = path + ".compact"
    merged_dirs = sorted(_glob.glob(_glob.escape(path) + ".merged*"))
    if os.path.exists(staging):
        shutil.rmtree(staging)  # disposable: side dirs outlive install
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
    if not os.path.exists(path) and merged_dirs:
        os.rename(merged_dirs[0], path)
        merged_dirs = merged_dirs[1:]
    if not os.path.exists(path):
        return None
    inputs = [path]
    if os.path.exists(old):
        inputs.append(old)  # mid-swap crash + restarted writer: merge
    inputs.extend(merged_dirs)  # stranded fold-asides from a crash
    reader = spark.read.option("mergeSchema", "true")
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df_in = reader.parquet(*inputs)
    if len(inputs) > 1:
        df_in = df_in.dropDuplicates()
    df = transform(df_in)
    df.coalesce(target_files).write.mode("overwrite").parquet(staging)
    n = spark.read.parquet(staging).count()
    aside = None
    if os.path.exists(old):
        # set the folded .old ASIDE — its rows exist only in staging
        # until the install rename; deletion waits until after it
        aside = next(
            p
            for i in range(len(merged_dirs) + 2)
            if not os.path.exists(
                p := path + ".merged" + ("" if i == 0 else str(i))
            )
        )
        os.rename(old, aside)
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    if aside is not None:
        shutil.rmtree(aside)
    for d in merged_dirs:
        shutil.rmtree(d)
    return n


def expire_neardup_index(
    spark: SparkSession,
    store_path: str,
    older_than_sec: int,
    now_sec: int | None = None,
    target_files: int = 4,
) -> dict[str, int]:
    """Dedup-HORIZON retention for `stream_neardup_ingest`'s band
    index (TUNING.md state-growth audit): evict index entries whose
    ``ingest_ts`` is older than ``older_than_sec``, so future arrivals
    are near-dup-checked only against the last horizon's worth of
    corpus — the production policy for crawl pipelines where a
    re-appearing year-old page should be re-admitted. The DOC store is
    untouched (the admitted corpus is the product; the horizon governs
    what future arrivals are compared against).

    Pre-stamp rows (NULL ``ingest_ts``, from stores written before the
    stamp existed) are KEPT — retention must never silently widen the
    admit set for an index that can't prove its age. Same crash-safe
    swap and single-writer rule as `compact_neardup_store`; run while
    the stream is quiescent. Returns kept/evicted counts."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    cutoff = (now_sec if now_sec is not None else int(_time.time())) - older_than_sec
    path = os.path.join(store_path, "bands")
    before: list[int] = []

    def rewrite(df: DataFrame) -> DataFrame:
        before.append(df.count())
        if "ingest_ts" not in df.columns:
            return df
        return df.filter(
            F.col("ingest_ts").isNull() | (F.col("ingest_ts") >= F.lit(cutoff))
        )

    kept = _crash_safe_rewrite(spark, path, rewrite, target_files)
    if kept is None:
        return {"kept": 0, "evicted": 0}
    return {"kept": kept, "evicted": before[0] - kept}


def compact_vector_index(
    spark: SparkSession,
    store_path: str,
    target_files: int = 4,
    id_col: str = "vec_id",
) -> int:
    """Periodic maintenance for `stream_vector_ingest`'s store
    (TUNING.md state-growth audit): the exactly-once layout accretes
    one ``<queryId>/batch-N`` directory per micro-batch, so file count
    — and with it probe-time listing cost — grows with stream
    LIFETIME even when the vector count doesn't. Fold every batch dir
    into one id-deduplicated snapshot, re-sorted by ``centroid_id`` so
    in-cell probes prune on row-group stats again (per-batch files
    sort only within themselves).

    The compacted layout (plain part files under the store root) reads
    identically through `read_vector_index`'s recursive lookup, and
    subsequent batches append new ``batch-N`` dirs beside it. A batch
    written but not yet checkpoint-committed at compaction time gets
    folded in AND replayed — the id-dedup on read absorbs that, same
    as cross-queryId re-delivery; still, run between ingest runs
    (single-writer), like every store maintenance op here. Crash-safe
    via the same two-rename swap. Returns the compacted row count."""
    # repartition BY centroid_id before the in-partition sort (the
    # helper's trailing coalesce to the same count is then a no-op):
    # coalescing independently-sorted partitions would interleave
    # cells across row groups and lose the pruning this exists for.
    n = _crash_safe_rewrite(
        spark,
        store_path,
        lambda df: df.dropDuplicates([id_col])
        .repartition(target_files, "centroid_id")
        .sortWithinPartitions("centroid_id"),
        target_files,
        recursive=True,
    )
    return n or 0


def stream_heavy_hitters(
    items: DataFrame,
    store_path: str,
    checkpoint: str,
    col: str = "token",
    depth: int = 4,
    width: int = 2048,
    track_per_batch: int = 64,
) -> StreamingQuery:
    """Streaming heavy hitters over an unbounded key stream with
    BOUNDED state: per micro-batch, (1) build the batch's count-min
    sketch (functions/sketches.cms_build — sketch-sized shuffle no
    matter the batch) and persist it; (2) persist the batch's
    ``track_per_batch`` most frequent keys as heavy-hitter CANDIDATES.
    Global counts are never stored per key — the persisted state is
    one 64 KB-ish sketch plus a short candidate list per batch, and
    sketches MERGE by cell-wise sum, so `read_heavy_hitters` answers
    "top keys over the whole stream so far" from sketch merges alone.

    The candidate list is the standard lossy-counting compromise: a
    key that is globally heavy must be locally frequent in at least
    some batch (a key below the per-batch track threshold in EVERY
    batch is bounded by track-rank frequency per batch), so true heavy
    hitters surface; the sketch then gives their (always >= true)
    count estimate. Exactly-once: both stores use the per-(queryId,
    batch) overwrite layout, so replays rewrite instead of
    double-counting.

    TOTAL checkpoint loss is the one residual at-least-once window:
    re-ingestion under a fresh queryId adds second sketches for the
    same data, and counter sketches — unlike HLL — are additive, not
    union-idempotent, so estimates inflate (still never undercount
    the true stream; the direction CMS already guarantees). Contrast
    `stream_distinct_sketches`, whose HLL blobs are set-union
    idempotent and survive checkpoint loss exactly.

    Single-writer store: one running query owns ``store_path`` at a
    time (the geometry guard below is checked once per RUN, not per
    batch, so two concurrent writers with different geometries could
    race past it — the same assumption every checkpoint-owned sink
    already carries, since two queries sharing one checkpoint is
    itself undefined)."""
    import os

    from crane_spark.functions.sketches import cms_build

    # Geometry verified against the store once per RUN (first batch),
    # then cached in the closure: re-scanning the whole meta/ tree
    # (parquet listing + distinct + collect) on EVERY micro-batch adds
    # a driver round-trip that grows with stream lifetime (ADVICE r7).
    # Batches this run writes after the check match (depth, width) by
    # construction.
    geometry_ok: list[bool] = []

    def ingest(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        qid = _streaming_query_id(checkpoint)
        sub = os.path.join(qid, f"batch-{batch_id}")
        # The store is SELF-DESCRIBING: each batch writes its sketch
        # geometry to meta/, and ingest refuses to append into a store
        # built with a different (depth, width) — cell-wise sums of
        # mixed-geometry sketches are silently meaningless, and a
        # reader probing with the wrong width hashes into the wrong
        # cells and returns zeros for genuinely heavy keys.
        if not geometry_ok:
            stored = _cms_store_geometry(spark, store_path)
            if stored is not None and stored != (depth, width):
                raise ValueError(
                    f"store {store_path!r} holds depth={stored[0]}, "
                    f"width={stored[1]} sketches; refusing to append "
                    f"depth={depth}, width={width}"
                )
            geometry_ok.append(True)
        spark.createDataFrame(
            [(depth, width)], "depth int, width int"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(store_path, "meta", sub)
        )
        sketch = cms_build(batch, col, depth, width)
        sketch.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(store_path, "sketch", sub)
        )
        cands = (
            batch.groupBy(col)
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc(col))
            .limit(track_per_batch)
            .select(col)
        )
        cands.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(store_path, "cands", sub)
        )

    return (
        items.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _cms_store_geometry(
    spark: SparkSession, store_path: str
) -> tuple[int, int] | None:
    """(depth, width) recorded in the store's meta/ dir; None for an
    empty or pre-meta store. Raises on a store holding MIXED
    geometries — their sketches must never be cell-wise merged."""
    import os

    meta_dir = os.path.join(store_path, "meta")
    if not os.path.exists(meta_dir):
        return None
    rows = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(meta_dir)
        .select("depth", "width")
        .distinct()
        .collect()
    )
    if not rows:
        return None
    if len(rows) > 1:
        raise ValueError(
            f"store {store_path!r} holds sketches of MIXED geometries "
            f"{sorted((r['depth'], r['width']) for r in rows)} — "
            "cell-wise merging them is meaningless; re-ingest with one"
        )
    return rows[0]["depth"], rows[0]["width"]


def read_heavy_hitters(
    spark: SparkSession,
    store_path: str,
    top_n: int = 10,
    col: str = "token",
    depth: int | None = None,
    width: int | None = None,
) -> DataFrame:
    """Top keys across every ingested batch and run: merge all batch
    sketches (cell-wise sum — one sketch-sized aggregate), probe the
    deduplicated candidate set, rank by estimate with a key tiebreak.

    Sketch geometry comes from the store's own meta/ records (written
    by `stream_heavy_hitters`), so a reader can never probe with the
    wrong (depth, width) — mismatched hashing returns silent zeros for
    genuinely heavy keys. Passing depth/width explicitly is only for
    pre-meta stores; explicit values that CONTRADICT the store's meta
    raise."""
    from crane_spark.functions.sketches import cms_estimate

    stored = _cms_store_geometry(spark, store_path)
    if stored is not None:
        if (depth is not None and depth != stored[0]) or (
            width is not None and width != stored[1]
        ):
            raise ValueError(
                f"store {store_path!r} records depth={stored[0]}, "
                f"width={stored[1]}; caller asked for depth={depth}, "
                f"width={width}"
            )
        depth, width = stored
    else:
        depth = 4 if depth is None else depth
        width = 2048 if width is None else width

    sketch = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(store_path + "/sketch")
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    cands = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(store_path + "/cands")
        .dropDuplicates([col])
    )
    return (
        cms_estimate(cands, sketch, col, depth, width)
        .orderBy(F.desc("est_count"), F.asc(col))
        .limit(top_n)
    )


def stream_distinct_sketches(
    keyed: DataFrame,
    store_path: str,
    checkpoint: str,
    key_col: str,
    group_col: str | None = None,
    lg_k: int = 14,
) -> StreamingQuery:
    """Streaming cardinality with bounded state: each micro-batch
    aggregates its keys into native HLL sketch blobs
    (`hll_sketch_agg`, one ~2^lg_k-byte blob per group) persisted in
    replay-idempotent per-(queryId, batch) overwrite directories —
    the distinct-count sibling of `stream_heavy_hitters`'s frequency
    sketches. `read_distinct_counts` answers "distinct keys so far,
    per group" by `hll_union_agg` over the stored blobs: sketch-count
    rows touched, the raw stream never rescanned. HLL union is SET
    idempotence — re-delivered data after total checkpoint loss
    changes nothing (unlike additive counter sketches), so this store
    is exactly-once under every failure mode. Exact per-key state
    (what dropDuplicates-based counting would keep) grows with
    cardinality; this state grows with #groups x #batches only."""
    import os

    def ingest(batch: DataFrame, batch_id: int) -> None:
        qid = _streaming_query_id(checkpoint)
        sub = os.path.join(qid, f"batch-{batch_id}")
        g = [group_col] if group_col else []
        (
            batch.groupBy(*g)
            .agg(F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sk"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(store_path, sub))
        )

    return (
        keyed.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_distinct_counts(
    spark: SparkSession, store_path: str, group_col: str | None = None
) -> DataFrame:
    """Distinct-count estimates from the accumulated sketch store:
    union the blobs per group and estimate."""
    df = spark.read.option("recursiveFileLookup", "true").parquet(store_path)
    g = [group_col] if group_col else []
    agg = df.groupBy(*g).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_distinct")
    )
    return agg
