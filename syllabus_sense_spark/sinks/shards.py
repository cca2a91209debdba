"""Balanced shard export — the terminal write of a curation pipeline.

Training jobs consume the curated corpus as N similarly-sized shards
(per-worker files, deterministic order). Naive ``repartition(N)``
round-robins whatever partitioning precedes it; this writer shards by
the md5 bucket of the document id, so:

- shard membership is a pure function of doc_id (stable across runs
  and cluster sizes — re-exports are diffable),
- the md5 bucket is uniform, so shards are balanced to ~1/sqrt(n_docs)
  without sampling or a size pass,
- one hash shuffle total, then one file per shard task.

At 100 TB pick n_shards so each shard is a few GB (training-reader
friendly) — the write is shuffle + sequential stream per shard either
way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARD_COL = "shard"


def with_shard(df: DataFrame, n_shards: int, id_col: str = "doc_id") -> DataFrame:
    """Attach the deterministic shard id (md5-bucket of the id)."""
    return df.withColumn(
        SHARD_COL,
        (
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10
            ).cast("bigint")
            % n_shards
        ).cast("int"),
    )


def write_shards(
    df: DataFrame, path: str, n_shards: int, id_col: str = "doc_id"
) -> None:
    """Export as ``shard=K/part-*.parquet`` with exactly one data file
    per shard: repartition BY the shard column (hash shuffle on the
    already-uniform bucket) so each output task owns one whole shard."""
    sharded = with_shard(df, n_shards, id_col)
    (
        sharded.repartition(n_shards, F.col(SHARD_COL))
        .write.partitionBy(SHARD_COL)
        .mode("overwrite")
        .parquet(path)
    )
