"""Exactly-once foreachBatch sink: replays must not duplicate."""

from __future__ import annotations

import os

from syllabus_sense_spark.streaming.exactly_once import (
    idempotent_batch_writer,
    read_exactly_once_output,
)


def _batch(spark, ids):
    return spark.createDataFrame(
        [(i, f"doc-{i}", "en" if i % 2 else "fr") for i in ids],
        "doc_id long, text string, lang string",
    )


def test_replayed_batch_is_not_duplicated(spark, tmp_path):
    out = str(tmp_path / "out")
    ledger = str(tmp_path / "ledger")
    write = idempotent_batch_writer(out, ledger, partition_cols=["lang"])

    write(_batch(spark, range(5)), 0)
    first = read_exactly_once_output(spark, out).count()
    # crash-replay of the same batch id (ledger fast-path)
    write(_batch(spark, range(5)), 0)
    assert read_exactly_once_output(spark, out).count() == first == 5


def test_partial_write_replay_overwrites_not_appends(spark, tmp_path):
    out = str(tmp_path / "out")
    ledger = str(tmp_path / "ledger")
    write = idempotent_batch_writer(out, ledger)

    write(_batch(spark, range(5)), 0)
    # simulate a crash BEFORE the commit marker: drop the ledger entry
    # and replay — dynamic partition overwrite must replace, not add
    os.remove(os.path.join(ledger, "batch-0.committed"))
    write(_batch(spark, range(5)), 0)
    got = read_exactly_once_output(spark, out)
    assert got.count() == 5
    assert os.path.exists(os.path.join(ledger, "batch-0.committed"))


def test_distinct_batches_accumulate(spark, tmp_path):
    out = str(tmp_path / "out")
    ledger = str(tmp_path / "ledger")
    write = idempotent_batch_writer(out, ledger, partition_cols=["lang"])

    write(_batch(spark, range(5)), 0)
    write(_batch(spark, range(5, 8)), 1)
    got = read_exactly_once_output(spark, out)
    assert got.count() == 8
    assert {r.doc_id for r in got.collect()} == set(range(8))
