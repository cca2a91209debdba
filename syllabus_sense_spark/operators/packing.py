"""Scalable sequence packing: concatenate-and-chunk documents into
fixed-capacity training sequences, with an optional two-level mode
for sources too large for one window partition.

Single-level (``n_buckets=1``): one exclusive cumsum per source —
identical semantics to the ``pack_sequences_greedy`` registered
query. Parallelism = number of sources.

Two-level: documents hash into ``n_buckets`` sub-partitions per
source; each bucket packs locally, then bucket-level pack counts
(one tiny row per bucket) prefix-sum into global pack-id bases. The
big data moves once (the window shuffle on (source, bucket)); the
second level runs on |sources|×|buckets| rows. Trade-off, stated:
each bucket's last pack may be partially filled, so up to
``n_buckets - 1`` extra partial packs per source versus the
single-partition packing — the standard price for parallel packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    *,
    size_col: str,
    capacity: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    n_buckets: int = 1,
) -> DataFrame:
    """Assign (pack_id, pack_offset) as if rows were concatenated in
    (group, bucket, order) order and cut into ``capacity``-token
    blocks. ``pack_id`` is globally consecutive within a group."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    bucket = (
        (F.crc32(F.col(order_col).cast("string")) % n_buckets).cast("int")
        if n_buckets > 1
        else F.lit(0)
    )
    rows = df.withColumn("_bucket", bucket)
    w_local = (
        Window.partitionBy(group_col, "_bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(size_col).over(w_local), F.lit(0))
    local = rows.withColumn("_local_pack", (start / capacity).cast("bigint")).withColumn(
        "pack_offset", start % capacity
    )
    if n_buckets == 1:
        return local.select(
            *df.columns, F.col("_local_pack").alias("pack_id"), "pack_offset"
        )
    # Level 2: per-bucket pack counts → prefix bases (tiny data).
    counts = (
        rows.groupBy(group_col, "_bucket")
        .agg(F.sum(size_col).alias("_tok"))
        .withColumn(
            "_n_packs", F.ceil(F.col("_tok").cast("double") / capacity).cast("bigint")
        )
    )
    w_base = (
        Window.partitionBy(group_col)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = counts.withColumn(
        "_pack_base", F.coalesce(F.sum("_n_packs").over(w_base), F.lit(0))
    ).select(group_col, "_bucket", "_pack_base")
    return (
        local.join(F.broadcast(bases), [group_col, "_bucket"])
        .withColumn("pack_id", F.col("_pack_base") + F.col("_local_pack"))
        .select(*df.columns, "pack_id", "pack_offset")
    )
