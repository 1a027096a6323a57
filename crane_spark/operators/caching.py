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
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_local_checkpoint(df: DataFrame) -> None:
    """Immediately free the executor-storage copy behind an eager
    ``localCheckpoint`` frame. The frame MUST NOT be used afterwards.

    Raises ``TypeError`` if ``df`` is not a checkpointed frame (its
    analyzed plan is not a bare ``LogicalRDD``) — a silent no-op here
    would hide the exact leak this helper exists to close.
    """
    plan = df._jdf.queryExecution().analyzed()
    name = plan.getClass().getSimpleName()
    if name != "LogicalRDD":
        raise TypeError(
            f"release_local_checkpoint expects a localCheckpoint()ed "
            f"frame (LogicalRDD plan), got {name}"
        )
    plan.rdd().unpersist(False)
