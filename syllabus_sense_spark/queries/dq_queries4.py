"""DQ batch 4 — distributional forensics and table profiling.

`dq_benford_first_digit`: the classic fraud/synthetic-data screen —
first-significant-digit distribution of order totals vs Benford's
law. The digit is taken from the exact integer-cents STRING form
(identical across engines), never via log10 (float log flips at
powers of ten). Expected Benford mass ships as integer-ppm literals,
so the whole row — observed ppm, expected ppm, |Δ| ppm — is exact
integer arithmetic; the L1 drift against expectation is the same
consumer-side contract as `dq_distribution_drift`.

`dq_profile_columns`: the per-column datasheet (nulls, distinct
cardinality) every ingestion gate runs first. One row per profiled
column; null counts come from one map-side-combined pass, exact
distinct counts from Spark's multi-distinct expand (the exact tier —
the approximate tier for wide tables is `agg_approx_sketches`).

Reference parity: the reference validates element text presence
before parsing (syllabus_parser.py's empty-text guard); these are
that validation step grown to table scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2

# Benford P(d) = log10(1 + 1/d), in exact ppm literals
_BENFORD_PPM = {
    1: 301_030,
    2: 176_091,
    3: 124_939,
    4: 96_910,
    5: 79_181,
    6: 66_947,
    7: 57_992,
    8: 51_153,
    9: 45_757,
}

_BENFORD_CASE = "CASE first_digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items()
) + " END"

# DuckDB types SUM(COUNT(*)) OVER () as HUGEINT, so every expression
# touching `total` must CAST back to BIGINT or the driver's
# type-sensitive value-hasher sees int128 where Spark emits int64
# (round-7 driver mismatch: rows/schema green, hash red).
_BENFORD_ORACLE = f"""
WITH cents AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM orders WHERE o_totalprice > 0
),
d AS (
  SELECT CAST(SUBSTR(CAST(c AS VARCHAR), 1, 1) AS INT) AS first_digit
  FROM cents
),
counts AS (
  SELECT first_digit, COUNT(*) AS n, SUM(COUNT(*)) OVER () AS total
  FROM d GROUP BY first_digit
)
SELECT CAST(first_digit AS INT) AS first_digit,
       CAST(n AS BIGINT) AS n,
       CAST(n * 1000000 // total AS BIGINT) AS obs_ppm,
       CAST({_BENFORD_CASE} AS BIGINT) AS benford_ppm,
       CAST(ABS(n * 1000000 // total - {_BENFORD_CASE}) AS BIGINT) AS delta_ppm
FROM counts
"""


@register("dq_benford_first_digit", _BENFORD_ORACLE)
def dq_benford_first_digit(spark, sf_dir):
    cents_df = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(cents("o_totalprice").alias("c"))
    )
    d = cents_df.select(
        F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias(
            "first_digit"
        )
    )
    counts = d.groupBy("first_digit").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    return counts.join(F.broadcast(total)).select(
        F.col("first_digit").cast("int").alias("first_digit"),
        F.col("n").cast("bigint").alias("n"),
        F.expr("n * 1000000 DIV total").alias("obs_ppm"),
        F.expr(f"CAST({_BENFORD_CASE} AS BIGINT)").alias("benford_ppm"),
        F.expr(
            f"ABS(n * 1000000 DIV total - {_BENFORD_CASE})"
        ).alias("delta_ppm"),
    )


_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
FROM orders"""
    for c in _PROFILE_COLS
)


@register("dq_profile_columns", _PROFILE_ORACLE)
def dq_profile_columns(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.count(F.col(c)).alias(f"nn_{c}") for c in _PROFILE_COLS
        ],
        *[
            F.count_distinct(F.col(c)).alias(f"nd_{c}")
            for c in _PROFILE_COLS
        ],
    )
    stack = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS
    )
    return agg.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack}) AS (col_name, nn, nd)"
        ),
        "n_rows",
    ).select(
        "col_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        (F.col("n_rows") - F.col("nn")).cast("bigint").alias("n_null"),
        F.col("nd").cast("bigint").alias("n_distinct"),
    )
