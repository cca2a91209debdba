"""Incremental rollup maintenance — process only what's new.

A standing pipeline lands data in date partitions and keeps rollup
tables current. Recomputing a rollup over the full history each run is
O(history); the incremental step is O(new partitions): diff the
partition values present in the source against those already in the
rollup, aggregate ONLY the missing ones (partition pruning makes the
scan touch just those directories), append.

Correctness contract: the rollup's grain includes the partition
column, so per-partition append never double-counts and a crashed run
re-processes only its missing partitions (append of a fully-aggregated
partition is idempotent per run).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def missing_partitions(
    spark: SparkSession, source_path: str, rollup_path: str, part_col: str
) -> list[str]:
    """Partition values present in the source layout but absent from
    the rollup table (driver-side listing + one tiny distinct scan)."""
    have: set[str] = set()
    if os.path.isdir(rollup_path) and any(
        f.endswith(".parquet") or f.startswith(part_col + "=")
        for root, dirs, files in [next(os.walk(rollup_path))]
        for f in dirs + files
    ):
        have = {
            str(r[0])
            for r in spark.read.parquet(rollup_path).select(part_col).distinct().collect()
        }
    src = {
        d.split("=", 1)[1]
        for d in os.listdir(source_path)
        if d.startswith(part_col + "=")
    }
    return sorted(src - have)


def incremental_rollup(
    spark: SparkSession,
    source_path: str,
    rollup_path: str,
    part_col: str,
    agg_fn,
) -> list[str]:
    """Bring ``rollup_path`` up to date with ``source_path``.

    ``agg_fn(df) -> DataFrame`` aggregates one-or-more partitions of
    source rows; its output must retain ``part_col``. Returns the
    partition values processed this run (empty = already current).
    """
    todo = missing_partitions(spark, source_path, rollup_path, part_col)
    if not todo:
        return []
    src = spark.read.parquet(source_path).filter(F.col(part_col).isin(todo))
    out = agg_fn(src)
    assert part_col in out.columns, "agg_fn must keep the partition column"
    out.write.partitionBy(part_col).mode("append").parquet(rollup_path)
    return todo
