"""Explicit lifecycle control for eager ``localCheckpoint`` frames.

Iterative operators (BPE merge rounds, NN-Descent rounds, dense
indexing) truncate lineage with ``df.localCheckpoint(eager=True)``,
which stores a full copy of the frame in executor storage. Spark only
frees that copy when the JVM-side Dataset becomes unreachable AND a
JVM GC cycle runs (ContextCleaner drains a weak-reference queue), so a
loop that checkpoints every round can stack hundreds of copies in
executor storage before the cleaner wakes up — on a 128 GiB heap, GC
pressure arrives long after the blocks stopped being useful.

``release_local_checkpoint`` frees the storage NOW: it reaches the
checkpointed RDD through the frame's analyzed plan (a ``LogicalRDD``
node wrapping exactly the RDD ``localCheckpoint`` persisted — no
scan of the global persistent-RDD registry, so concurrent queries'
blocks are never touched) and unpersists it. After release the frame
is unusable (lineage was truncated; there is nothing to recompute
from), so callers release only frames whose every consumer has run —
the loop pattern is: materialize round N+1, then release round N.

Durability (round 6): ``localCheckpoint`` copies live ONLY in executor
storage — on a real cluster, losing an executor mid-loop destroys the
only copy of that round's state and, because lineage was truncated,
Spark cannot recompute it: the whole job dies (a 1000-round BPE train
or NN-Descent build restarts from zero). Every iterative operator
therefore accepts ``reliable_every=N`` (default 0 = off, local-only —
the right choice on local[*] where executor==driver): every Nth round
routes through :func:`loop_checkpoint`'s REAL ``df.checkpoint()``,
which writes the round's rows to the SparkContext checkpoint directory
(HDFS/object store on a cluster — set ``sc.setCheckpointDir`` to a
durable path; :func:`ensure_checkpoint_dir` falls back to a local temp
dir on ``local[*]`` masters only and raises on clusters, where a
driver-local dir would be unreadable by executors). Recovery story: after
an executor loss, rounds since the last reliable checkpoint recompute
from its files instead of dying — bounded replay, exactly the
Structured Streaming state-store discipline applied to batch loops.
Proven under REAL executor loss, not simulation: tests/
test_executor_loss.py kill -9s every executor of a local-cluster
session and shows the reliable frame recompute exactly while the
localCheckpoint copy fails.
Both checkpoint flavors materialize identical rows, so outputs are
bit-identical with the flag on or off (tested); the only trade is
round latency every Nth round. Reliable checkpoint files are removed
by the ContextCleaner only when
``spark.cleaner.referenceTracking.cleanCheckpoints=true``; otherwise
they persist for post-mortem reuse and need manual cleanup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_checkpoint_dir(spark) -> str:
    """Return the session's RDD checkpoint directory. When unset, a
    temp-dir fallback is applied ONLY on ``local[*]`` masters (where
    executor==driver, so a driver-local dir is exactly as durable as
    the storage the feature protects). On any other master an unset
    dir raises: a driver-local path there would be invisible to the
    executors that must read the checkpoint files back — silently
    converting ``reliable_every`` into fake durability. Set
    ``sc.setCheckpointDir`` to an HDFS/object-store path up front on
    clusters."""
    sc = spark.sparkContext
    cur = sc.getCheckpointDir()
    if cur:
        return cur
    if not _local_fallback_allowed(sc.master):
        raise RuntimeError(
            "reliable_every needs a durable checkpoint directory on a "
            f"cluster (master={sc.master!r}): call "
            "sc.setCheckpointDir('<hdfs/object-store path>') before the "
            "loop. A driver-local fallback would not be readable by "
            "executors and defeats the durability the flag promises."
        )
    import tempfile

    path = tempfile.mkdtemp(prefix="crane_reliable_ckpt_")
    sc.setCheckpointDir(path)
    return path


def _local_fallback_allowed(master: str | None) -> bool:
    """True only for in-process masters (``local``, ``local[8]``,
    ``local[*]``, ``local-cluster[...]`` is NOT one — its executors
    are separate processes with their own working dirs)."""
    m = master or ""
    return m == "local" or (m.startswith("local[") and m.endswith("]"))


def loop_checkpoint(
    df: DataFrame, round_no: int, reliable_every: int = 0
) -> DataFrame:
    """One iterative-loop round's lineage truncation: eager
    ``localCheckpoint`` normally; a REAL eager ``checkpoint()`` on
    rounds where ``reliable_every`` divides ``round_no`` (1-based), so
    executor loss replays at most ``reliable_every - 1`` rounds. Both
    paths materialize the same rows in the same partition order —
    bit-identical loop output either way. Frames from either path are
    LogicalRDD-backed and safe to pass to
    :func:`release_local_checkpoint` (for reliable frames the release
    is a storage no-op; the durable files stay on disk)."""
    if reliable_every > 0 and round_no % reliable_every == 0:
        ensure_checkpoint_dir(df.sparkSession)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def release_local_checkpoint(df: DataFrame) -> None:
    """Immediately free the executor-storage copy behind an eager
    ``localCheckpoint`` frame. The frame MUST NOT be used afterwards.

    Raises ``TypeError`` if ``df`` is not a checkpointed frame (its
    analyzed plan is not a bare ``LogicalRDD``) — a silent no-op here
    would hide the exact leak this helper exists to close.

    Depends on pyspark-private JVM accessors (``_jdf``,
    ``queryExecution().analyzed()``, ``LogicalRDD.rdd()``), verified
    against the pyspark 3.5/4.x classic surface (ADVICE r5: probe
    instead of crashing with a bare AttributeError). On a runtime
    exposing a different surface (Spark Connect frames have no
    ``_jdf``; a future pyspark may rename the accessors) this raises a
    documented ``RuntimeError`` — callers may catch it and skip
    explicit release: the ContextCleaner still frees the copies,
    merely later.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        name = plan.getClass().getSimpleName()
    except Exception as exc:  # noqa: BLE001 — py4j errors vary by version
        raise RuntimeError(
            "release_local_checkpoint needs pyspark's private JVM plan "
            "accessors (DataFrame._jdf.queryExecution().analyzed(); "
            "pinned-good: pyspark 3.5-4.1 classic sessions). This runtime "
            "does not expose them (Spark Connect session, or a changed "
            "pyspark internal surface). Skip explicit release — the "
            "ContextCleaner frees localCheckpoint copies after GC — or pin "
            f"a verified pyspark. Underlying error: {exc!r}"
        ) from exc
    if name != "LogicalRDD":
        raise TypeError(
            f"release_local_checkpoint expects a localCheckpoint()ed "
            f"frame (LogicalRDD plan), got {name}"
        )
    try:
        plan.rdd().unpersist(False)
    except Exception as exc:  # noqa: BLE001
        raise RuntimeError(
            "release_local_checkpoint resolved the analyzed plan but could "
            "not reach LogicalRDD.rdd().unpersist (pinned-good: pyspark "
            "3.5-4.1). See docstring for the safe fallback. Underlying "
            f"error: {exc!r}"
        ) from exc


def release_reliable_checkpoint(df: DataFrame) -> None:
    """Delete the DURABLE files behind an eager ``df.checkpoint()``
    frame — the reliable twin of :func:`release_local_checkpoint`, for
    loops/streams that no longer need a round's recovery point once
    every consumer has committed. The frame MUST NOT be used
    afterwards (lineage was truncated; the files were its only
    substance).

    Why it exists: Spark deletes reliable checkpoint files only when
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` AND the
    RDD is GC'd — by default they accumulate forever. A LONG-RUNNING
    stream whose every micro-batch takes durable checkpoints
    (``stream_training_corpus(reliable_every=...)``) would otherwise
    grow the checkpoint volume without bound and die on ENOSPC days
    in; the batch loops cap at files-per-run and tolerate the default,
    but the stream must clean per batch.

    No-op (returns) when the frame has no checkpoint file — i.e. a
    ``localCheckpoint`` frame, so callers can release every
    loop_checkpoint frame through ONE call pair without tracking which
    rounds were durable. Raises like release_local_checkpoint when the
    JVM surface is unavailable.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        name = plan.getClass().getSimpleName()
    except Exception as exc:  # noqa: BLE001 — py4j errors vary by version
        raise RuntimeError(
            "release_reliable_checkpoint needs pyspark's private JVM plan "
            "accessors (pinned-good: pyspark 3.5-4.1 classic sessions). "
            "Skip explicit release and set "
            "spark.cleaner.referenceTracking.cleanCheckpoints=true so the "
            "ContextCleaner deletes the files after GC instead. "
            f"Underlying error: {exc!r}"
        ) from exc
    if name != "LogicalRDD":
        raise TypeError(
            f"release_reliable_checkpoint expects a checkpoint()ed frame "
            f"(LogicalRDD plan), got {name}"
        )
    rdd = plan.rdd()
    opt = rdd.getCheckpointFile()
    if not opt.isDefined():
        return  # localCheckpoint frame: no durable files to delete
    spark = df.sparkSession
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(opt.get())
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(path, True)
