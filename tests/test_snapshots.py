"""Snapshot sink laws: atomic versioned publish, append-by-reference,
reader isolation (time travel), overwrite, and the optimistic-
concurrency retry (sinks/snapshots.py)."""

from __future__ import annotations

import json
import os

import pytest

from syllabus_sense_spark.errors import InvalidOutputDirectoryError
from syllabus_sense_spark.sinks.snapshots import (
    list_versions,
    read_snapshot,
    write_snapshot,
)


def _ids(df):
    return sorted(r.id for r in df.collect())


def test_append_versions_and_time_travel(spark, tmp_path):
    table = str(tmp_path / "t1")
    v1 = write_snapshot(spark.range(0, 5), table)
    v2 = write_snapshot(spark.range(5, 8), table, mode="append")
    assert (v1, v2) == (1, 2)
    assert list_versions(table) == [1, 2]
    # latest sees the union; v1 pinned AFTER v2 exists sees only v1
    assert _ids(read_snapshot(spark, table)) == list(range(8))
    assert _ids(read_snapshot(spark, table, version=1)) == list(range(5))


def test_overwrite_starts_fresh_but_history_remains(spark, tmp_path):
    table = str(tmp_path / "t2")
    write_snapshot(spark.range(0, 4), table)
    write_snapshot(spark.range(100, 103), table, mode="overwrite")
    assert _ids(read_snapshot(spark, table)) == [100, 101, 102]
    assert _ids(read_snapshot(spark, table, version=1)) == [0, 1, 2, 3]


def test_read_errors(spark, tmp_path):
    with pytest.raises(InvalidOutputDirectoryError):
        read_snapshot(spark, str(tmp_path / "missing"))
    table = str(tmp_path / "t3")
    write_snapshot(spark.range(3), table)
    with pytest.raises(InvalidOutputDirectoryError):
        read_snapshot(spark, table, version=9)


def test_vacuum_retires_history_keeps_latest(spark, tmp_path):
    from syllabus_sense_spark.sinks.snapshots import vacuum

    table = str(tmp_path / "t5")
    write_snapshot(spark.range(0, 4), table)
    write_snapshot(spark.range(100, 102), table, mode="overwrite")
    stats = vacuum(table, keep_last=1)
    assert stats["kept_versions"] == [2]
    assert stats["dropped_manifests"] == 1
    assert stats["dropped_files"] >= 1  # v1's now-unreferenced files
    # latest unaffected; retired version no longer resolvable
    assert _ids(read_snapshot(spark, table)) == [100, 101]
    with pytest.raises(InvalidOutputDirectoryError):
        read_snapshot(spark, table, version=1)
    # append files shared across versions survive a vacuum that keeps
    # the referencing version
    table2 = str(tmp_path / "t6")
    write_snapshot(spark.range(0, 3), table2)
    write_snapshot(spark.range(3, 5), table2, mode="append")
    vacuum(table2, keep_last=1)
    assert _ids(read_snapshot(spark, table2)) == list(range(5))


def test_concurrent_publish_retries_past_winner(spark, tmp_path):
    """If another writer wins the version race, the loser must retry
    on top of the winner's manifest instead of clobbering it."""
    table = str(tmp_path / "t4")
    write_snapshot(spark.range(0, 3), table)
    # simulate a racing writer that already published v2 referencing
    # no files (an empty overwrite)
    race = os.path.join(table, "manifests", "v00000002.json")
    with open(race, "w") as fh:
        json.dump({"version": 2, "mode": "overwrite", "files": []}, fh)
    v = write_snapshot(spark.range(10, 12), table, mode="append")
    assert v == 3
    # append built on the WINNER's (empty) state, not on v1
    assert _ids(read_snapshot(spark, table)) == [10, 11]
    assert _ids(read_snapshot(spark, table, version=1)) == [0, 1, 2]
