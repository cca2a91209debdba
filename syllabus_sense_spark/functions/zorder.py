"""Z-order (Morton) curve value as a pure Catalyst expression.

``zvalue(x, y, bits)`` interleaves the low ``bits`` of two
non-negative integer columns — bit i of x lands at position 2i, bit i
of y at 2i+1 — so range-partitioning on the z-value clusters rows
that are close in BOTH dimensions into the same files. That is the
multi-dimensional upgrade of ``sinks/layout.write_range_clustered``:
a 2-D box predicate then prunes most files by their z-range instead
of scanning one full dimension.

The interleave unrolls to ``2*bits`` shift/and/or terms — all JVM
built-ins inside whole-stage codegen; no UDF, no Python. 16 bits per
dimension (the default) distinguishes 65k positions per axis, plenty
for file-level clustering at any scale (files ≫ 65k cells only when
a single cell spans files, which range partitioning handles anyway).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zvalue(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative ints."""
    cx = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    cy = (F.col(y) if isinstance(y, str) else y).cast("bigint")
    one = F.lit(1).cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(cx, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(cy, i).bitwiseAND(one), 2 * i + 1)
        )
    return z


def quantize(col: Column | str, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric/temporal column into the [0, 2^bits) integer grid
    — the normalization step before ``zvalue`` for non-integer keys."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    cells = (1 << bits) - 1
    scaled = (c - F.lit(float(lo))) / F.lit(float(hi - lo)) * cells
    return F.least(F.greatest(scaled.cast("bigint"), F.lit(0)), F.lit(cells))
