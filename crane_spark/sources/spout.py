"""A custom Python DataSource replicating the reference's spout.

The reference's only source is a text file drained line-by-line and
re-chunked into 500-tuple batches (Spout: /root/reference/util.py:13-25;
batching loop: crane_master.py:148-164, CRANE_BATCH_SIZE util.py:61).
This maps onto Spark 4's Python DataSource API:

* batch: each partition reads a line range of the file
* streaming: a SimpleDataSourceStreamReader whose offset is the line
  number — every micro-batch serves at most ``batch_size`` lines, the
  exact spout/micro-batcher semantics, but with checkpointable offsets
  (replay = readBetweenOffsets, exactly-once instead of XOR-ack).

Usage:
    spark.dataSource.register(CraneSpoutDataSource)
    spark.read.format("crane_spout").option("path", p).load()
    spark.readStream.format("crane_spout").option("path", p).load()
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

DEFAULT_BATCH_SIZE = 500  # CRANE_BATCH_SIZE, util.py:61

SPOUT_SCHEMA = StructType(
    [
        StructField("line_no", LongType()),
        StructField("value", StringType()),
    ]
)


class _LineRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _read_lines(path: str) -> list[str]:
    with open(path, encoding="utf-8") as fh:
        return fh.read().splitlines()


class SpoutBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.batch_size = int(options.get("batch_size", DEFAULT_BATCH_SIZE))

    def partitions(self) -> list[InputPartition]:
        n = len(_read_lines(self.path))
        return [
            _LineRange(s, min(s + self.batch_size, n))
            for s in range(0, max(n, 1), self.batch_size)
        ]

    def read(self, partition: _LineRange) -> Iterator[tuple]:
        lines = _read_lines(self.path)
        for i in range(partition.start, min(partition.end, len(lines))):
            yield (i, lines[i])


class SpoutStreamReader(SimpleDataSourceStreamReader):
    """Offset = next line number to serve. Each read() call returns at
    most batch_size lines (one spout micro-batch)."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.batch_size = int(options.get("batch_size", DEFAULT_BATCH_SIZE))

    def initialOffset(self) -> dict:
        return {"line": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lines = _read_lines(self.path)
        lo = start["line"]
        hi = min(lo + self.batch_size, len(lines))
        rows = [(i, lines[i]) for i in range(lo, hi)]
        return iter(rows), {"line": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # Replay for recovery — the checkpointed twin of Crane's
        # timeout-replay (crane_master.py:52-57).
        lines = _read_lines(self.path)
        return iter(
            [(i, lines[i]) for i in range(start["line"], min(end["line"], len(lines)))]
        )

    def commit(self, end: dict) -> None:
        pass


class CraneSpoutDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "crane_spout"

    def schema(self) -> StructType:
        return SPOUT_SCHEMA

    def reader(self, schema: StructType) -> SpoutBatchReader:
        return SpoutBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SpoutStreamReader:  # noqa: ARG002
        return SpoutStreamReader(self.options)
