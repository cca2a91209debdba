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
3. ``abort()`` deletes all temps — a failed job publishes nothing —
   UNLESS ``commit()`` had already started mutating the directory: a
   crashed commit leaves every byte recoverable (old shards as
   ``.retired-*``, unpublished new shards as ``.tmp-*``), and abort
   preserves that state instead of sweeping it.

Recovery window: a crashed commit's preserved state survives any
number of LATER append-mode commits' retired-file handling (each
commit deletes only the ``.retired-*`` names it created itself), but
the orphan ``.tmp-*`` sweep in any later successful commit is
indiscriminate — recover a crash (or accept its loss) before the next
job commits to the same directory.

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
    DataSourceStreamWriter,
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
        # set once commit() starts mutating the directory; from then
        # on abort() must preserve temps/retired files (recoverable
        # crash state) instead of sweeping them
        self._commit_started = False

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
        # mode("overwrite"): retire pre-existing shards BEFORE any new
        # shard becomes visible (the FileOutputCommitter overwrite
        # order) — a reader never sees a mix of old and new shards.
        # Retirement is a RENAME to an invisible ``.retired-*`` name,
        # not a delete, so every crash state stays recoverable:
        #   - crash mid-retire / before publish: the directory can
        #     read as EMPTY, but every old shard survives as
        #     ``.retired-<commit>-<name>`` and the new data as
        #     ``.tmp-*``;
        #   - crash mid-publish: partial new output is visible; the
        #     rest of the new data is still in ``.tmp-*``, the old
        #     generation in ``.retired-*``.
        # abort() preserves both once _commit_started is set; retired
        # files are deleted only after EVERY publish rename succeeded.
        self._commit_started = True
        retired_this_run: list[str] = []
        if self.overwrite:
            # The retired name carries a PER-COMMIT token: a plain
            # ``.retired-<name>`` would collide with (and silently
            # clobber via os.rename, then delete as this run's own)
            # the preserved crash state of an earlier overwrite whose
            # shard names repeat — exactly the state the
            # only-delete-what-you-retired policy below exists to keep.
            commit_token = uuid.uuid4().hex
            incoming = {m.final_name for m in messages if m is not None}
            for name in os.listdir(self.path):
                # visible shards only: a hidden ``.retired-*.jsonl``
                # is some earlier crash's preserved state, never this
                # commit's to retire (and re-retiring it would queue
                # it for deletion below).
                if name.startswith("."):
                    continue
                if name.endswith(".jsonl") and name not in incoming:
                    retired = f".retired-{commit_token}-{name}"
                    os.rename(
                        os.path.join(self.path, name),
                        os.path.join(self.path, retired),
                    )
                    retired_this_run.append(retired)
        for m in messages:
            if m is None:
                continue
            src = os.path.join(self.path, m.tmp_name)
            dst = os.path.join(self.path, m.final_name)
            os.rename(src, dst)  # atomic publish
        # Full new generation visible: the old one can go now — but
        # ONLY the shards THIS commit retired. A ``.retired-*`` left
        # by an earlier crashed overwrite is someone else's preserved
        # crash state; an append-mode commit (which retires nothing)
        # must never destroy it.
        for name in retired_this_run:
            os.remove(os.path.join(self.path, name))
        # sweep orphans: failed/speculative attempts' temps from THIS
        # run. Task attempts of this job are the only writers of
        # ``.tmp-*`` since commit() began; published shards were
        # renamed away above, so what remains here is this job's
        # failed/speculative attempts plus any pre-existing orphans —
        # the recovery window for an earlier crash's ``.tmp-*`` thus
        # lasts until the next successful commit to the directory
        # (documented in the module docstring).
        for name in os.listdir(self.path):
            if name.startswith(".tmp-"):
                os.remove(os.path.join(self.path, name))

    def abort(self, messages) -> None:
        if self._commit_started:
            # A partially-run commit is a recoverable crash state
            # (old shards in .retired-*, unpublished new shards in
            # .tmp-*, all invisible to readers). Sweeping here would
            # make the lost window unrecoverable — preserve it.
            return
        for name in os.listdir(self.path):
            if name.startswith(".tmp-"):
                os.remove(os.path.join(self.path, name))


class JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming tier of the same sink — per-microbatch two-phase
    commit with an IDEMPOTENT publish, which is what turns Structured
    Streaming's at-least-once batch replay into exactly-once output:

    - tasks write dot-temp shards exactly like the batch writer, but
      the final name is prefixed ``batch-<id>-`` so output is
      traceable to its epoch;
    - ``commit(messages, batchId)`` first checks the
      ``_batch-<id>.committed`` marker: a replayed batch (failure
      after publish, before the checkpoint advanced) finds the marker,
      publishes NOTHING, and just sweeps its temps — the rename set of
      each epoch hits the directory at most once;
    - the marker itself is published by atomic rename (write
      ``.tmp-marker``, rename), so a crash mid-commit leaves either
      no marker (replay republishes — renames of already-renamed
      files are the swept-temp no-op) or a full one.

    ``abort(messages, batchId)`` deletes temps; a failed epoch
    publishes nothing.
    """

    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise InvalidOutputDirectoryError(
                "<missing>", "No path supplied for jsonl_sink stream"
            )
        self.fields = schema.fieldNames()

    # --- executor side -------------------------------------------------
    def write(self, iterator) -> JsonlCommitMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        token = uuid.uuid4().hex
        tmp_name = f".tmp-{token}"
        # final name is completed per-epoch at commit time
        final_name = f"part-{pid:05d}-{token}.jsonl"
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, tmp_name), "w") as f:
            for row in iterator:
                d = row.asDict()
                f.write(
                    json.dumps({k: d[k] for k in self.fields}, sort_keys=True)
                )
                f.write("\n")
        return JsonlCommitMessage(tmp_name, final_name)

    # --- driver side ---------------------------------------------------
    def _marker(self, batchId: int) -> str:
        return os.path.join(self.path, f"_batch-{batchId}.committed")

    def _sweep(self) -> None:
        for name in os.listdir(self.path):
            if name.startswith(".tmp-"):
                os.remove(os.path.join(self.path, name))

    def commit(self, messages, batchId: int) -> None:
        os.makedirs(self.path, exist_ok=True)
        if os.path.exists(self._marker(batchId)):
            self._sweep()  # replayed epoch: already published
            return
        for m in messages:
            if m is None:
                continue
            src = os.path.join(self.path, m.tmp_name)
            if not os.path.exists(src):
                continue  # lost speculative twin already swept
            dst = os.path.join(self.path, f"batch-{batchId}-{m.final_name}")
            os.rename(src, dst)
        marker_tmp = os.path.join(self.path, f".tmp-marker-{batchId}")
        with open(marker_tmp, "w") as f:
            f.write(str(len([m for m in messages if m is not None])))
        os.rename(marker_tmp, self._marker(batchId))
        self._sweep()

    def abort(self, messages, batchId: int) -> None:
        if os.path.isdir(self.path):
            self._sweep()


class JsonlSinkDataSource(DataSource):
    """Register once per session:
    ``spark.dataSource.register(JsonlSinkDataSource)`` then
    ``df.write.format("jsonl_sink").option("path", d).mode("append").save()``
    or ``df.writeStream.format("jsonl_sink").option("path", d)...``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> JsonlStreamWriter:
        return JsonlStreamWriter(self.options, schema)


def register_jsonl_sink(spark) -> None:
    """Idempotent registration of the ``jsonl_sink`` format."""
    spark.dataSource.register(JsonlSinkDataSource)
