"""Bucketed co-located joins — the no-shuffle path for repeated
large×large joins.

At 100 TB the dominant cost of a fact×fact equi-join is the shuffle of
both sides. Writing both tables bucketed (and sorted) on the join key
fixes the partitioning ON DISK: every future join on that key becomes
a zero-exchange sort-merge join — each task reads bucket i of both
sides and merges. This is the standing-pipeline shape (e.g. the
reference's questions table repeatedly joined back to its topics
table): pay one shuffle at write time, never again.

The reference has no equivalent (single-process, one JSON file); this
is engine-level capability the brief's scale mandate requires.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: str | Sequence[str],
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as an external bucketed (+sorted) parquet table.

    ``n_buckets`` is the unit of join parallelism for every future
    co-located join; at cluster scale pick it so one bucket of the
    larger table fits an executor's memory (e.g. 100 TB / 8192 buckets
    ≈ 12 GB per bucket-pair merge).
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *cols)
    )
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written with :func:`write_bucketed`
    on their bucket key. With matching bucket counts Spark plans a
    sort-merge join with NO Exchange on either side (verified by
    ``tests/test_bucketing.py`` against the physical plan)."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on=keys, how=how)
