"""Binned range join — the scale-ready plan for point-in-interval
joins.

A naive range join (`l.x >= r.lo AND l.x < r.hi`) has no equi-key, so
Spark plans a (broadcast) nested-loop: every left row × every
interval. Fine for a handful of intervals; quadratic death at scale.

The binned form quantizes the domain into fixed-width bins: each
interval explodes into the bins it overlaps, each point maps to
exactly one bin, and the join becomes an equi-join on bin id +
a residual range filter. Cost: |left| + Σ interval_width/bin_width
join rows — linear, shuffle on a uniform integer key, AQE-splittable.
A point lies in exactly one bin, so no dedup is needed afterwards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``points`` to rows of ``intervals`` where
    ``lo <= point < hi``, as an equi-join on bin id."""
    p_bin: Column = F.floor(F.col(point_col) / bin_width)
    binned_points = points.withColumn("__bin", p_bin)
    spanned = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width),
                F.floor((F.col(hi_col) - 1) / bin_width),
            )
        ),
    )
    out = binned_points.join(spanned, "__bin", how).filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return out.drop("__bin")
