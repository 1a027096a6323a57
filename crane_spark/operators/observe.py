"""In-flight pipeline observability: `df.observe` metrics that ride
the job itself — row counts, null counts, and value ranges computed by
the SAME tasks that produce the output, with no second scan. At 100 TB
a separate profiling pass doubles the read bill; an observation is
free.

The reference surfaces progress only as master-side prints of acked
batch counts (crane_master.py:86-98); this is the declarative twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed_quality(
    df: DataFrame,
    null_cols: list[str] | None = None,
    range_cols: list[str] | None = None,
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach a quality observation to ``df``.

    Returns the observed frame (plan unchanged — metrics piggyback on
    whatever action runs it) and the Observation; read
    ``obs.get`` AFTER an action completes. Metrics: total rows, a
    null count per ``null_cols`` entry, min/max per ``range_cols``
    entry.
    """
    metrics: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols or []:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}")
        )
    for c in range_cols or []:
        metrics.append(F.min(c).alias(f"min_{c}"))
        metrics.append(F.max(c).alias(f"max_{c}"))
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
