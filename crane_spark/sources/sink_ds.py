"""A custom Python DataSource SINK in the reference's output format.

The reference's only sink is the master's console printout
``key --- value`` once all batches ack (print_result,
/root/reference/crane_master.py:166-169). This maps it onto Spark 4's
Python DataSource writer API as a durable twin: every partition writes
its rows as ``key --- value`` lines, the driver-side commit records a
manifest (the analog of "all root batches acked -> print"), and an
abort leaves no manifest — readers ignore uncommitted output, giving
write atomicity-by-manifest on any filesystem.

A DataSourceStreamWriter provides the streaming path: per-micro-batch
files committed under a batch manifest (exactly-once with the query's
checkpoint, replacing the XOR-ack machinery).

Usage:
    spark.dataSource.register(CraneSinkDataSource)
    df.write.format("crane_sink").option("path", out).mode("append").save()
    df.writeStream.format("crane_sink").option("path", out)...
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class _FileDone(WriterCommitMessage):
    def __init__(self, rel_path: str, n_rows: int):
        self.rel_path = rel_path
        self.n_rows = n_rows


def _write_partition(path: str, prefix: str, iterator) -> _FileDone:
    from pyspark import TaskContext

    pid = TaskContext.get().partitionId()
    rel = f"{prefix}part-{pid:05d}-{uuid.uuid4().hex[:8]}.txt"
    os.makedirs(path, exist_ok=True)
    n = 0
    with open(os.path.join(path, rel), "w", encoding="utf-8") as fh:
        for row in iterator:
            fh.write(f"{row[0]} --- {row[1]}\n")
            n += 1
    return _FileDone(rel, n)


def _commit_manifest(path: str, name: str, messages) -> None:
    manifest = {
        "files": sorted(m.rel_path for m in messages if m is not None),
        "rows": sum(m.n_rows for m in messages if m is not None),
    }
    with open(os.path.join(path, name), "w", encoding="utf-8") as fh:
        json.dump(manifest, fh)


class CraneSinkWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator) -> _FileDone:
        return _write_partition(self.path, "", iterator)

    def commit(self, messages) -> None:
        _commit_manifest(self.path, "_MANIFEST.json", messages)

    def abort(self, messages) -> None:  # uncommitted files are ignorable
        pass


class CraneSinkStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator) -> _FileDone:
        return _write_partition(self.path, "", iterator)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        _commit_manifest(self.path, f"_MANIFEST-{batchId}.json", messages)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        pass


class CraneSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "crane_sink"

    def writer(self, schema, overwrite: bool) -> CraneSinkWriter:  # noqa: ARG002
        return CraneSinkWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> CraneSinkStreamWriter:  # noqa: ARG002
        return CraneSinkStreamWriter(self.options)


def read_crane_sink(path: str) -> dict[str, str]:
    """Read back committed ``key --- value`` output (manifest-gated)."""
    out: dict[str, str] = {}
    for name in sorted(os.listdir(path)):
        if not name.startswith("_MANIFEST"):
            continue
        with open(os.path.join(path, name), encoding="utf-8") as fh:
            for rel in json.load(fh)["files"]:
                with open(os.path.join(path, rel), encoding="utf-8") as part:
                    for line in part.read().splitlines():
                        k, _, v = line.partition(" --- ")
                        out[k] = v
    return out
