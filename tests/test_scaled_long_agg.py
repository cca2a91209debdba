"""Laws for the scaled-long exact aggregation (_util.cents/xsum/xavg)
— the fast twin of decimal SUM introduced in the round-14 optimization
(guide §2.3). Two pins:

1. cents(c) == (dec2(c) * 100).cast(long) — the per-row extraction
   law, on adversarial doubles AND on every money/rate/quantity
   column of the harness tables.
2. xsum(unscaled, scale, prec) is bit-identical (as a double) to
   F.sum(decimal_expr).cast("double") — the aggregation law, on
   values spanning sub-cent to >long-split magnitudes, positive and
   negative, including null groups.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from syllabus_sense_spark.queries._util import (
    cents,
    dec2,
    dsum,
    hundredths,
    rate,
    xsum,
)
from syllabus_sense_spark.tables import load

# Doubles chosen to stress the rounding seam: exact 2dp values, ties
# at the half-cent, 3dp tie values, negatives, zero, large magnitudes
# (still far under the 1e13 analysis bound).
ADVERSARIAL = [
    0.0,
    0.005,
    -0.005,
    0.015,
    0.025,
    1234.56,
    -1234.56,
    1234.565,
    -1234.565,
    0.1 + 0.2,  # 0.30000000000000004
    99999999.99,
    -99999999.99,
    12345678901.23,
    1e-10,
    -1e-10,
    50.0,
    0.07,
    0.01,
    0.10,
]


def test_cents_matches_decimal_cast_adversarial(spark):
    df = spark.createDataFrame([(v,) for v in ADVERSARIAL], "v double")
    bad = df.filter(cents("v") != (dec2("v") * F.lit(100)).cast("long")).count()
    assert bad == 0


def test_cents_matches_decimal_cast_all_2dp_values(spark):
    """The supported domain: every double that IS a shortest-repr 2dp
    value (how the harness generates money/rate/quantity columns) —
    dense small cents plus random large ones, signed."""
    import random

    rng = random.Random(14)
    cents_vals = list(range(-2000, 2000))
    cents_vals += [rng.randrange(-10**12, 10**12) for _ in range(20000)]
    df = spark.createDataFrame([(c / 100,) for c in cents_vals], "v double")
    bad = df.filter(cents("v") != (dec2("v") * F.lit(100)).cast("long")).count()
    assert bad == 0


def test_cents_documented_divergence_boundary(spark):
    """OUTSIDE the supported domain the two casts can differ: a double
    strictly below a half-cent whose product+0.5 rounds up to the
    integer. This pin documents the boundary (and would flag a future
    cents() change that silently altered it); the data-law test above
    is what proves the harness columns never hit it."""
    v = 0.004999999999999999  # repr has 18 frac digits; < 0.005
    df = spark.createDataFrame([(v,)], "v double")
    row = df.select(
        cents("v").alias("c"), (dec2("v") * F.lit(100)).cast("long").alias("d")
    ).collect()[0]
    assert (row.c, row.d) == (1, 0)


def test_cents_matches_decimal_cast_on_harness_columns(spark, sf_dir):
    cases = [
        ("lineitem", ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]),
        ("orders", ["o_totalprice"]),
        ("supplier", ["s_acctbal"]),
        ("customer", ["c_acctbal"]),
        ("part", ["p_retailprice"]),
        ("events", ["value"]),
    ]
    for table, cols in cases:
        df = load(spark, sf_dir, table)
        for col in cols:
            bad = df.filter(
                cents(col) != (dec2(col) * F.lit(100)).cast("long")
            ).count()
            assert bad == 0, f"{table}.{col}: {bad} cents-law violations"


def test_hundredths_matches_rate(spark):
    df = spark.createDataFrame([(v,) for v in (0.0, 0.01, 0.07, 0.1)], "v double")
    for plus in (False, True):
        bad = df.filter(
            hundredths("v", plus=plus)
            != (rate("v", plus=plus) * F.lit(100)).cast("long")
        ).count()
        assert bad == 0


def _bits(x):
    import struct

    return None if x is None else struct.pack(">d", x)


def test_xsum_bit_identical_to_decimal_sum(spark):
    # Grouped values spanning magnitudes: tiny, cancellations, groups
    # whose exact sum exceeds 2^53 (double-precision trap), a null-only
    # group, a single-row group.
    rows = []
    import random

    rng = random.Random(7)
    for g in range(6):
        for _ in range(200):
            rows.append((g, round(rng.uniform(-1e5, 1e6), 2), round(rng.uniform(0, 0.1), 2)))
    rows += [(6, 12345678901.23, 0.05)] * 900  # sum ≈ 1.1e13 → 1.1e19 in 10^-6 units
    rows += [(7, None, None)]
    rows += [(8, 0.01, 0.0)]
    df = spark.createDataFrame(rows, "g int, price double, disc double")

    old = df.groupBy("g").agg(
        dsum(dec2("price")).alias("s2"),
        dsum(dec2("price") * rate("disc")).alias("s4"),
        dsum(dec2("price") * rate("disc") * rate("disc", plus=True)).alias("s6"),
        dsum(dec2("price") * dec2("disc")).alias("sq"),
    )
    pc = cents("price")
    dp = pc * hundredths("disc")
    ch = dp * hundredths("disc", plus=True)
    new = df.groupBy("g").agg(
        xsum(pc, 2, 18).alias("s2"),
        xsum(dp, 4, 22).alias("s4"),
        xsum(ch, 6, 26).alias("s6"),
        xsum(pc * cents("disc"), 4, 37).alias("sq"),
    )
    a = {r.g: tuple(_bits(v) for v in (r.s2, r.s4, r.s6, r.sq)) for r in old.collect()}
    b = {r.g: tuple(_bits(v) for v in (r.s2, r.s4, r.s6, r.sq)) for r in new.collect()}
    assert a == b
