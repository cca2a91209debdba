"""Small-file compaction for partitioned parquet sinks.

Streaming/append sinks accumulate many small files per partition
(every micro-batch writes at least one per task); at 100 TB the
resulting metadata and open-file overhead dominates scan time long
before data volume does. This operator rewrites a partitioned dataset
into size-targeted files per partition — the maintenance job every
production lakehouse schedules (Delta OPTIMIZE / Iceberg rewrite, here
in plain parquet).

Strategy: read the dataset, compute per-partition byte sizes from the
file listing (driver-side listing only — no data pass), derive the
file count per partition from a target file size, and rewrite with
``repartition(partition_cols)`` + AQE-coalesced writes into a fresh
directory, then atomically swap. The rewrite is one shuffle of the
compacted partitions only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..errors import InvalidOutputDirectoryError

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def partition_file_stats(root: str) -> dict[str, tuple[int, int]]:
    """{partition_dir_relpath: (n_files, total_bytes)} for a local
    Hive-layout dataset (driver-side listing; object stores would use
    their listing API the same way)."""
    stats: dict[str, tuple[int, int]] = {}
    for dirpath, _dirnames, files in os.walk(root):
        data = [f for f in files if f.endswith(".parquet")]
        if not data:
            continue
        rel = os.path.relpath(dirpath, root)
        total = sum(os.path.getsize(os.path.join(dirpath, f)) for f in data)
        stats[rel] = (len(data), total)
    return stats


def compact_partitioned(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
    min_files_to_compact: int = 2,
) -> dict[str, int]:
    """Rewrite partitions whose file count exceeds what the target
    file size requires. Returns {partition: files_before} for the
    partitions rewritten.

    The rewrite shuffles ONLY the oversplit partitions (partition
    pruning on read); untouched partitions keep their files byte-for-
    byte. Output lands in-place via a temp-dir + rename swap per
    partition — on object stores this would be a committer/manifest
    swap instead.
    """
    if not os.path.isdir(path):
        raise InvalidOutputDirectoryError(path)
    stats = partition_file_stats(path)
    todo: dict[str, int] = {}
    for rel, (n_files, total) in stats.items():
        needed = max(1, -(-total // target_file_bytes))  # ceil
        if n_files > needed and n_files >= min_files_to_compact:
            todo[rel] = n_files
    if not todo:
        return todo

    df = spark.read.parquet(path)
    for rel, _ in todo.items():
        # rel like "topic=T1" or "a=1/b=2" → partition filter.
        preds = []
        for part in rel.split(os.sep):
            col, val = part.split("=", 1)
            preds.append(F.col(col) == val)
        cond = preds[0]
        for p in preds[1:]:
            cond = cond & p
        part_total = stats[rel][1]
        n_out = max(1, -(-part_total // target_file_bytes))
        part_dir = os.path.join(path, rel)
        tmp_dir = part_dir + "._compact_tmp"
        (
            df.filter(cond)
            .drop(*partition_cols)
            .repartition(n_out)
            .write.mode("overwrite")
            .parquet(tmp_dir)
        )
        # Swap: remove old data files, move compacted ones in.
        for f in os.listdir(part_dir):
            if f.endswith(".parquet"):
                os.remove(os.path.join(part_dir, f))
        for f in os.listdir(tmp_dir):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(tmp_dir, f), os.path.join(part_dir, f)
                )
        for f in os.listdir(tmp_dir):
            os.remove(os.path.join(tmp_dir, f))
        os.rmdir(tmp_dir)
    return todo
