"""Keyed upsert (CDC apply) onto a parquet dataset.

The reference's sink rewrites its whole JSON file per batch
(file_output_manager.py:34-69); the engine's append sinks fixed that,
but pipelines also need MERGE semantics: apply a change batch (insert
+ update + delete markers) to a keyed table. Without a transactional
table format, the scalable plain-parquet recipe is partition-scoped
copy-on-write, implemented here:

1. tag each change row's target partition (same partition expr as the
   table layout);
2. rewrite ONLY partitions that appear in the change batch: current
   rows anti-joined by key against the changes (drops updated/deleted
   keys), unioned with the non-delete change rows;
3. write to fresh partition dirs and swap.

Cost scales with the touched partitions, not the table — the same
contract Delta/Iceberg MERGE gives, expressed as Spark primitives.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DELETE_COL = "_deleted"


def apply_changes(
    current: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    version_cols: list[str] | None = None,
) -> DataFrame:
    """Pure merge: the change row replaces the current row per key;
    ``_deleted`` rows drop the key. ``changes`` must carry all of
    ``current``'s columns plus optionally ``_deleted`` boolean.

    PRECONDITION: one change row per key. A CDC batch with several
    changes for one key has no well-defined winner without a version
    order — pass ``version_cols`` and the greatest tuple wins inside
    the batch (ties broken by nothing: keep version_cols total).
    Without ``version_cols``, duplicate keys in the batch all survive
    the merge, exactly as unioned."""
    if version_cols:
        from pyspark.sql import Window

        w = Window.partitionBy(*key_cols).orderBy(
            *[F.desc(c) for c in version_cols]
        )
        changes = (
            changes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    has_delete = DELETE_COL in changes.columns
    survivors = current.join(changes.select(key_cols), key_cols, "left_anti")
    incoming = (
        changes.filter(~F.coalesce(F.col(DELETE_COL), F.lit(False))).drop(DELETE_COL)
        if has_delete
        else changes
    )
    return survivors.unionByName(incoming.select(current.columns))


def upsert_partitioned(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> list[str]:
    """Partition-scoped copy-on-write MERGE into a Hive-layout parquet
    dataset. Returns the rewritten partition values."""
    parts = [
        r[0]
        for r in changes.select(partition_col).distinct().collect()
    ]
    if not parts:
        return []
    current = spark.read.parquet(path).filter(F.col(partition_col).isin(parts))
    merged = apply_changes(current, changes.filter(F.col(partition_col).isin(parts)), key_cols)
    # Stage the rewritten partitions, then swap directories.
    staged = path + "._upsert_tmp"
    merged.write.partitionBy(partition_col).mode("overwrite").parquet(staged)
    import shutil

    for v in parts:
        sub = f"{partition_col}={v}"
        dst = os.path.join(path, sub)
        src = os.path.join(staged, sub)
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        if os.path.isdir(src):
            shutil.move(src, dst)
    shutil.rmtree(staged, ignore_errors=True)
    return parts


def upsert_versioned(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key_cols: list[str],
    version_cols: list[str],
    partition_col: str,
) -> list[str]:
    """Last-writer-wins MERGE: on key conflict the row with the
    greatest ``version_cols`` tuple survives, whether it arrived in
    this batch or an earlier one. This is the Kafka-compaction /
    CRDT-register semantic a STREAMING upserter needs — the result is
    independent of how the change stream was micro-batched, because
    max-by-version is associative and commutative (a total tiebreak
    in version_cols makes it exact). Same partition-scoped
    copy-on-write cost model as ``upsert_partitioned``."""
    from pyspark.sql import Window

    parts = [r[0] for r in changes.select(partition_col).distinct().collect()]
    if not parts:
        return []
    in_parts = F.col(partition_col).isin(parts)
    # first batch of a stream targets a not-yet-existing table
    if os.path.isdir(path) and any(e.name.startswith(f"{partition_col}=") for e in os.scandir(path)):
        current = spark.read.parquet(path).filter(in_parts)
    else:
        os.makedirs(path, exist_ok=True)
        current = spark.createDataFrame([], changes.schema)
    all_rows = current.unionByName(
        changes.filter(in_parts).select(current.columns)
    )
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.desc(c) for c in version_cols]
    )
    merged = (
        all_rows.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    staged = path + "._upsert_tmp"
    merged.write.partitionBy(partition_col).mode("overwrite").parquet(staged)
    import shutil

    for v in parts:
        sub = f"{partition_col}={v}"
        dst = os.path.join(path, sub)
        src = os.path.join(staged, sub)
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        if os.path.isdir(src):
            shutil.move(src, dst)
    shutil.rmtree(staged, ignore_errors=True)
    return parts
