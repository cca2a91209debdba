"""Range-clustered parquet export: the data-layout maintenance op
that makes time/key-range scans cheap downstream.

``write_range_clustered`` range-partitions the data on a clustering
column (sampled range exchange), sorts within each partition, and
writes one file per range — so every parquet file covers a disjoint
slice of the clustering key and its row-group min/max statistics
prune whole files for range predicates at read time (the poor
engine's Z-ORDER, exact for a single dimension).

At 100 TB: one range exchange (Spark samples boundaries), no global
sort barrier; file count = target_files, decoupled from cluster
width. Re-run it as compaction after many small appends.

Reference anchor: the reference's sink rewrites whole JSON files per
batch (file_output_manager.py:34-60) with no layout control; this is
the layout-aware counterpart for scan-heavy consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import _validate_sink_dir


def write_range_clustered(
    df: DataFrame, path: str, cluster_col: str, target_files: int = 8
) -> None:
    """Write ``df`` as parquet clustered on ``cluster_col``: files
    cover disjoint key ranges, rows sorted inside each file."""
    _validate_sink_dir(path)
    (
        df.repartitionByRange(target_files, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    *,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    target_files: int = 8,
    bits: int = 16,
) -> None:
    """2-D clustered parquet export: quantize both columns onto a
    2^bits grid, range-partition on the Morton z-value, sort within
    partitions — rows near in BOTH dimensions co-locate, so a 2-D box
    predicate prunes most files via their (x, y) min/max stats. The
    z column is layout-only and not written."""
    from ..functions.zorder import quantize, zvalue

    _validate_sink_dir(path)
    z = zvalue(
        quantize(col_x, *x_range, bits=bits),
        quantize(col_y, *y_range, bits=bits),
        bits=bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(target_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_ranges(spark: SparkSession, path: str, cluster_col: str) -> DataFrame:
    """Audit helper: per-file (min, max, rows) of the clustering
    column — disjointness of these ranges is exactly the file-pruning
    guarantee."""
    return (
        spark.read.parquet(path)
        .select(cluster_col, F.input_file_name().alias("file"))
        .groupBy("file")
        .agg(
            F.min(cluster_col).alias("lo"),
            F.max(cluster_col).alias("hi"),
            F.count(F.lit(1)).alias("rows"),
        )
    )
