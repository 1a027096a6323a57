"""Custom stateful streaming operators via applyInPandasWithState.

This is the Spark mapping of the reference's stateful bolts (a bolt
instance carries ``self.counts`` across execute() calls within a batch,
word_count_topology.py:22-38) generalized to state that SURVIVES across
micro-batches with exactly-once checkpointing — what a Crane bolt could
never do (its state dies with each batch ack).

State lives in the state store keyed by the group key; the pandas
function sees (key, iterator-of-batches, state handle).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

RUNNING_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("running_count", T.LongType()),
        T.StructField("running_sum", T.DoubleType()),
    ]
)

RUNNING_STATE = T.StructType(
    [
        T.StructField("count", T.LongType()),
        T.StructField("sum", T.DoubleType()),
    ]
)


def running_totals(
    stream: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Per-key running (count, sum) maintained in the state store —
    each micro-batch emits the updated totals for the keys it touched.

    Use ``outputMode('update')``. Totals are exact for integer-valued
    doubles; for money-grade exactness at scale, store cents as longs.
    """

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state,
    ) -> Iterator[pd.DataFrame]:
        count, total = state.get if state.exists else (0, 0.0)  # .get is a property
        for pdf in batches:
            count += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((count, total))
        yield pd.DataFrame(
            {"key": [key[0]], "running_count": [count], "running_sum": [total]}
        )

    return (
        stream.selectExpr(f"CAST({key_col} AS STRING) AS key", f"{value_col}")
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_OUTPUT,
            stateStructType=RUNNING_STATE,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
