"""JSONL quarantine source + small-file compaction sink maintenance."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from syllabus_sense_spark.sinks.compact import (
    compact_partitioned,
    partition_file_stats,
)
from syllabus_sense_spark.sources.jsonl import (
    read_documents_jsonl,
    split_quarantine,
)


def test_jsonl_quarantines_bad_lines(spark, tmp_path):
    p = tmp_path / "dump.jsonl"
    p.write_text(
        '{"doc_id": 1, "source": "web", "lang": "en", "text": "hello"}\n'
        "THIS IS NOT JSON\n"
        '{"doc_id": 2, "source": "web", "lang": "fr", "text": "salut"}\n'
        '{"doc_id": 3, "source": "web"'  # truncated line
    )
    df = read_documents_jsonl(spark, str(p))
    clean, quarantined = split_quarantine(df)
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    bad = [r.raw_line for r in quarantined.collect()]
    assert len(bad) == 2
    assert "NOT JSON" in bad[0] or "NOT JSON" in bad[1]


def test_jsonl_missing_path_raises(spark, tmp_path):
    import pytest

    from syllabus_sense_spark import InvalidDocumentSourceError

    with pytest.raises(InvalidDocumentSourceError):
        read_documents_jsonl(spark, str(tmp_path / "nope"))


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    out = str(tmp_path / "sink")
    # Simulate a micro-batch-fragmented sink: 8 appends of 2 partitions.
    for i in range(8):
        (
            spark.range(i * 100, (i + 1) * 100)
            .select(
                F.col("id"),
                (F.col("id") % 2).cast("string").alias("part"),
            )
            .repartition(2)
            .write.partitionBy("part")
            .mode("append")
            .parquet(out)
        )
    before = partition_file_stats(out)
    assert all(n >= 8 for n, _ in before.values())
    rows_before = spark.read.parquet(out).groupBy("part").count().collect()

    compacted = compact_partitioned(
        spark, out, ["part"], target_file_bytes=64 * 1024 * 1024
    )
    assert set(compacted) == set(before)

    # Spark caches file listings per path string; force a fresh read.
    spark.catalog.clearCache()
    after = partition_file_stats(out)
    assert all(n == 1 for n, _ in after.values())
    rows_after = spark.read.parquet(out).groupBy("part").count().collect()
    assert sorted(map(tuple, rows_after)) == sorted(map(tuple, rows_before))
    # No stray temp dirs.
    assert not [d for d in os.listdir(out) if "_compact_tmp" in d]


def test_shard_export_balanced_and_deterministic(spark, sf_dir, tmp_path):
    from syllabus_sense_spark.sinks.shards import with_shard, write_shards
    from syllabus_sense_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    out = str(tmp_path / "shards")
    write_shards(docs, out, n_shards=8)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()

    sizes = {r.shard: r.n for r in back.groupBy("shard").count().withColumnRenamed("count", "n").collect()}
    assert len(sizes) == 8
    mean = sum(sizes.values()) / 8
    assert all(abs(n - mean) < mean for n in sizes.values())  # no empty/2x shard

    # Stable assignment: recomputing yields identical membership.
    a = {(r.doc_id, r.shard) for r in with_shard(docs, 8).select("doc_id", "shard").collect()}
    b = {(r.doc_id, r.shard) for r in back.select("doc_id", "shard").collect()}
    assert a == b

    # One data file per shard.
    import glob as g
    for k in range(8):
        files = g.glob(f"{out}/shard={k}/*.parquet")
        assert len(files) == 1, (k, files)
