"""JSONL sink as a first-class Spark data source — the WRITE side of
the Python DataSource API, completing the custom-connector surface
(batch reader: docx_datasource.py; streaming reader:
events_stream_datasource.py; now the batch writer).

``df.write.format("jsonl_sink").option("path", dir).save()`` writes
one JSONL shard per task with the two-phase commit protocol a
distributed sink needs for exactly-once output under task retries
and speculative execution:

1. each task writes to an INVISIBLE temp file (``.tmp-<uuid>``,
   dot-prefixed so globbing readers skip it) and returns the temp
   name + its final shard name in its WriterCommitMessage;
2. the driver's ``commit(messages)`` renames exactly the files named
   by SUCCESSFUL tasks into place (rename = atomic publish on the
   same filesystem) and sweeps any orphaned temps (failed attempts,
   speculative losers);
3. ``abort()`` deletes all temps — a failed job publishes nothing.

This is the Hadoop FileOutputCommitter v1 shape in miniature: a
task's output becomes visible only through the driver's commit of
that task's message, so a partition retried twice still publishes
exactly one shard.

Reference parity: the reference's sink writes per-topic JSON files
with a read-merge-write cycle (output_manager/file_output_manager.py:34-69)
and no atomicity; this is that sink rebuilt with the commit
discipline a cluster requires.

Rows serialize via ``json.dumps`` with sorted keys; the schema is
whatever the written DataFrame carries (primitives land as JSON
scalars — read back with an explicit schema, the house JSONL rule).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

from ..errors import InvalidOutputDirectoryError


class JsonlCommitMessage(WriterCommitMessage):
    def __init__(self, tmp_name: str, final_name: str):
        self.tmp_name = tmp_name
        self.final_name = final_name


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise InvalidOutputDirectoryError(
                "<missing>", "No path supplied for jsonl_sink"
            )
        self.fields = schema.fieldNames()
        self.overwrite = overwrite

    # --- executor side -------------------------------------------------
    def write(self, iterator) -> JsonlCommitMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        token = uuid.uuid4().hex
        tmp_name = f".tmp-{token}"
        final_name = f"part-{pid:05d}-{token}.jsonl"
        os.makedirs(self.path, exist_ok=True)
        tmp_path = os.path.join(self.path, tmp_name)
        with open(tmp_path, "w") as f:
            for row in iterator:
                d = row.asDict()
                f.write(json.dumps({k: d[k] for k in self.fields}, sort_keys=True))
                f.write("\n")
        return JsonlCommitMessage(tmp_name, final_name)

    # --- driver side ---------------------------------------------------
    def commit(self, messages) -> None:
        keep = set()
        for m in messages:
            if m is None:
                continue
            src = os.path.join(self.path, m.tmp_name)
            dst = os.path.join(self.path, m.final_name)
            os.rename(src, dst)  # atomic publish
            keep.add(m.final_name)
        # sweep orphans: failed/speculative attempts' temps
        for name in os.listdir(self.path):
            if name.startswith(".tmp-"):
                os.remove(os.path.join(self.path, name))

    def abort(self, messages) -> None:
        for name in os.listdir(self.path):
            if name.startswith(".tmp-"):
                os.remove(os.path.join(self.path, name))


class JsonlSinkDataSource(DataSource):
    """Register once per session:
    ``spark.dataSource.register(JsonlSinkDataSource)`` then
    ``df.write.format("jsonl_sink").option("path", d).mode("append").save()``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options, schema, overwrite)


def register_jsonl_sink(spark) -> None:
    """Idempotent registration of the ``jsonl_sink`` format."""
    spark.dataSource.register(JsonlSinkDataSource)
