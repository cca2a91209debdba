"""Commit-protocol tests for the Python DataSource JSONL sink: temp
files are invisible, abort publishes nothing, commit publishes
exactly the successful tasks' shards."""

from __future__ import annotations

import json
import os
import tempfile

import pytest


def _write(spark, path, n=100, parts=4):
    df = spark.range(n).selectExpr("id", "id * 2 AS dbl").repartition(parts)
    from syllabus_sense_spark.sources.jsonl_datasource import register_jsonl_sink

    register_jsonl_sink(spark)
    df.write.format("jsonl_sink").option("path", path).mode("append").save()


def test_roundtrip_and_shard_layout(spark):
    tmp = tempfile.mkdtemp(prefix="jsonl_sink_t_")
    _write(spark, tmp, n=100, parts=4)
    names = sorted(os.listdir(tmp))
    assert len(names) == 4
    assert all(n.startswith("part-") and n.endswith(".jsonl") for n in names)
    assert not any(n.startswith(".tmp-") for n in names)
    rows = []
    for n in names:
        with open(os.path.join(tmp, n)) as f:
            rows += [json.loads(line) for line in f]
    assert sorted(r["id"] for r in rows) == list(range(100))
    assert all(r["dbl"] == r["id"] * 2 for r in rows)


def test_task_failure_publishes_nothing(spark):
    """A job whose task fails must abort: no visible output files."""
    from syllabus_sense_spark.sources.jsonl_datasource import register_jsonl_sink

    register_jsonl_sink(spark)
    tmp = tempfile.mkdtemp(prefix="jsonl_sink_f_")

    from pyspark.sql import functions as F

    @F.udf("long")
    def boom(x):
        raise ValueError("planted failure")

    df = spark.range(10).select(boom("id").alias("id"))
    with pytest.raises(Exception):
        df.write.format("jsonl_sink").option("path", tmp).mode("append").save()
    leftover = [n for n in os.listdir(tmp) if not n.startswith(".")]
    assert leftover == []
    # temps may survive the abort sweep (in-flight tasks can drop a
    # temp after the driver aborts) — they stay INVISIBLE, and the
    # next successful job's commit sweeps them:
    import time

    time.sleep(1.0)  # let the killed job's task threads drain
    _write(spark, tmp, n=5, parts=2)
    assert [n for n in os.listdir(tmp) if n.startswith(".tmp-")] == []
    rows = []
    for n in os.listdir(tmp):
        if not n.startswith("."):
            with open(os.path.join(tmp, n)) as f:
                rows += [json.loads(line) for line in f]
    assert sorted(r["id"] for r in rows) == list(range(5))


def test_empty_partitions_still_commit(spark):
    tmp = tempfile.mkdtemp(prefix="jsonl_sink_e_")
    _write(spark, tmp, n=2, parts=8)
    rows = []
    for n in os.listdir(tmp):
        with open(os.path.join(tmp, n)) as f:
            rows += [json.loads(line) for line in f]
    assert sorted(r["id"] for r in rows) == [0, 1]


def test_overwrite_crash_mid_commit_never_mixes_old_and_new():
    """The overwrite commit retires stale shards BEFORE publishing
    (FileOutputCommitter order): if the commit dies half-way through
    its renames, a reader may see PARTIAL new output but never a mix
    of old and new shards — and every byte stays recoverable (old
    shards as .retired-*, unpublished new shards as .tmp-*), with
    abort() preserving that state instead of sweeping it. Simulated by
    driving commit() directly with a second message whose temp file is
    missing (rename raises), then abort() as Spark would."""
    from syllabus_sense_spark.sources.jsonl_datasource import (
        JsonlCommitMessage,
        JsonlSinkWriter,
    )

    tmp = tempfile.mkdtemp(prefix="jsonl_sink_c_")
    with open(os.path.join(tmp, "part-old-aaaa.jsonl"), "w") as f:
        f.write('{"id": -1}\n')
    with open(os.path.join(tmp, ".tmp-new1"), "w") as f:
        f.write('{"id": 1}\n')
    with open(os.path.join(tmp, ".tmp-new3"), "w") as f:
        f.write('{"id": 3}\n')

    class _Schema:  # writer only reads fieldNames()
        @staticmethod
        def fieldNames():
            return ["id"]

    w = JsonlSinkWriter({"path": tmp}, _Schema(), overwrite=True)
    msgs = [
        JsonlCommitMessage(".tmp-new1", "part-00000-new1.jsonl"),
        JsonlCommitMessage(".tmp-missing", "part-00001-new2.jsonl"),
        JsonlCommitMessage(".tmp-new3", "part-00002-new3.jsonl"),
    ]
    with pytest.raises(OSError):
        w.commit(msgs)
    w.abort(msgs)  # Spark aborts after a failed commit
    visible = sorted(n for n in os.listdir(tmp) if not n.startswith("."))
    # old shard retired BEFORE the crash; first new shard published
    assert visible == ["part-00000-new1.jsonl"]
    hidden = sorted(n for n in os.listdir(tmp) if n.startswith("."))
    # abort after a partial publish preserves the crash state: the old
    # generation and the unpublished new shard are both recoverable
    # (retired names carry a per-commit token)
    retired = [
        n
        for n in hidden
        if n.startswith(".retired-") and n.endswith("-part-old-aaaa.jsonl")
    ]
    assert len(retired) == 1
    assert ".tmp-new3" in hidden
    with open(os.path.join(tmp, retired[0])) as f:
        assert json.loads(f.read())["id"] == -1


def test_overwrite_commit_success_leaves_no_hidden_files(spark):
    """The happy path must not accumulate .retired-* debris: after a
    successful overwrite commit the directory holds exactly the new
    generation's shards."""
    from syllabus_sense_spark.sources.jsonl_datasource import register_jsonl_sink

    register_jsonl_sink(spark)
    tmp = tempfile.mkdtemp(prefix="jsonl_sink_h_")
    _write(spark, tmp, n=10, parts=2)
    df = spark.range(50, 53).selectExpr("id", "id * 2 AS dbl").repartition(1)
    df.write.format("jsonl_sink").option("path", tmp).mode("overwrite").save()
    assert [n for n in os.listdir(tmp) if n.startswith(".")] == []


def test_overwrite_retires_stale_shards(spark):
    """mode('overwrite') must not mix old part files with new output:
    pre-existing *.jsonl shards are retired at commit."""
    from syllabus_sense_spark.sources.jsonl_datasource import register_jsonl_sink

    register_jsonl_sink(spark)
    tmp = tempfile.mkdtemp(prefix="jsonl_sink_o_")
    _write(spark, tmp, n=10, parts=2)  # append: 2 shards, ids 0..9
    df = spark.range(100, 103).selectExpr("id", "id * 2 AS dbl").repartition(1)
    df.write.format("jsonl_sink").option("path", tmp).mode("overwrite").save()
    rows = []
    for n in os.listdir(tmp):
        if not n.startswith("."):
            with open(os.path.join(tmp, n)) as f:
                rows += [json.loads(line) for line in f]
    assert sorted(r["id"] for r in rows) == [100, 101, 102]


def test_overwrite_commit_preserves_colliding_foreign_crash_state():
    """An overwrite commit retiring a shard whose NAME repeats across
    generations must not clobber an earlier crashed overwrite's
    preserved crash state for that same name: retired names carry a
    per-commit token, so the foreign ``.retired-*`` file survives both
    the rename and this commit's own retired-file deletion."""
    from syllabus_sense_spark.sources.jsonl_datasource import (
        JsonlCommitMessage,
        JsonlSinkWriter,
    )

    tmp = tempfile.mkdtemp(prefix="jsonl_sink_fc_")
    # earlier crashed overwrite's preserved state for the SAME shard name
    foreign = ".retired-deadbeef-part-00000-gen1.jsonl"
    with open(os.path.join(tmp, foreign), "w") as f:
        f.write('{"id": -3}\n')
    # the current visible generation, same shard name as gen1
    with open(os.path.join(tmp, "part-00000-gen1.jsonl"), "w") as f:
        f.write('{"id": -2}\n')
    with open(os.path.join(tmp, ".tmp-g2"), "w") as f:
        f.write('{"id": 2}\n')

    class _Schema:
        @staticmethod
        def fieldNames():
            return ["id"]

    w = JsonlSinkWriter({"path": tmp}, _Schema(), overwrite=True)
    w.commit([JsonlCommitMessage(".tmp-g2", "part-00000-gen2.jsonl")])
    names = os.listdir(tmp)
    assert foreign in names, "foreign crash state clobbered by overwrite"
    with open(os.path.join(tmp, foreign)) as f:
        assert json.loads(f.read())["id"] == -3
    assert sorted(n for n in names if not n.startswith(".")) == [
        "part-00000-gen2.jsonl"
    ]


def test_append_commit_preserves_foreign_crash_state():
    """A commit deletes only the .retired-* names IT created: an
    append-mode commit (which retires nothing) running after another
    job's crashed overwrite must leave that job's preserved crash
    state (.retired-* shards) intact — the recovery window documented
    in the module docstring."""
    from syllabus_sense_spark.sources.jsonl_datasource import (
        JsonlCommitMessage,
        JsonlSinkWriter,
    )

    tmp = tempfile.mkdtemp(prefix="jsonl_sink_p_")
    # another job's crash state: a retired old generation
    with open(os.path.join(tmp, ".retired-part-old-bbbb.jsonl"), "w") as f:
        f.write('{"id": -7}\n')
    with open(os.path.join(tmp, ".tmp-app1"), "w") as f:
        f.write('{"id": 9}\n')

    class _Schema:
        @staticmethod
        def fieldNames():
            return ["id"]

    w = JsonlSinkWriter({"path": tmp}, _Schema(), overwrite=False)
    w.commit([JsonlCommitMessage(".tmp-app1", "part-00000-app1.jsonl")])
    assert ".retired-part-old-bbbb.jsonl" in os.listdir(tmp)
    with open(os.path.join(tmp, ".retired-part-old-bbbb.jsonl")) as f:
        assert json.loads(f.read())["id"] == -7
    # the new shard published normally
    visible = [n for n in os.listdir(tmp) if not n.startswith(".")]
    assert visible == ["part-00000-app1.jsonl"]
