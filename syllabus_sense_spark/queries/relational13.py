"""Inequality + apportionment batch: per-segment Gini coefficient and
largest-remainder (Hamilton) budget allocation.

Both are pure-integer computations end to end — ranks, sums of
rank·cents cross-products, and floor divisions — so the oracle hash
is exact with no float anywhere. Wide intermediates (rank·cents sums
reach ~1e17 at sf0.1 and beyond BIGINT at warehouse scale) go through
DECIMAL(38,0) on the Spark side and HUGEINT in DuckDB; numerators are
provably non-negative so Spark's truncating DIV and DuckDB's flooring
// agree (the SCALE.md sign rule).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2

# Gini over per-customer revenue, by market segment. With x_1..x_n
# ascending, G = (2·Σi·x_i − (n+1)·Σx_i) / (n·Σx_i) — rank ties on
# equal cents don't change Σi·x_i, so the custkey tiebreak is only
# for a deterministic plan, not for the value.
_GINI_ORACLE = """
WITH rev AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT segment, cents,
         ROW_NUMBER() OVER (PARTITION BY segment
                            ORDER BY cents ASC, o_custkey ASC) AS rk
  FROM rev
),
agg AS (
  SELECT segment,
         COUNT(*) AS n,
         SUM(CAST(cents AS HUGEINT)) AS s,
         SUM(CAST(rk AS HUGEINT) * CAST(cents AS HUGEINT)) AS s1
  FROM ranked GROUP BY segment
)
SELECT segment,
       CAST(n AS BIGINT) AS n_customers,
       CAST(s AS BIGINT) AS cents,
       CAST(((2 * s1 - (n + 1) * s) * 1000000) // (n * s) AS BIGINT)
         AS gini_ppm
FROM agg
"""


@register("customer_gini_segment", _GINI_ORACLE)
def customer_gini_segment(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", cents("o_totalprice").alias("cents")
    )
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    rev = (
        o.groupBy("o_custkey")
        .agg(F.sum("cents").alias("cents"))
        .join(F.broadcast(c), "o_custkey")
    )
    w = Window.partitionBy("segment").orderBy(
        F.asc("cents"), F.asc("o_custkey")
    )
    ranked = rev.select(
        "segment", "cents", F.row_number().over(w).alias("rk")
    )
    agg = ranked.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"),
        F.sum(
            F.col("rk").cast("decimal(38,0)")
            * F.col("cents").cast("decimal(38,0)")
        ).alias("s1"),
    )
    return agg.select(
        "segment",
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("s").cast("bigint").alias("cents"),
        F.expr(
            "CAST(((2 * s1 - (n + 1) * s) * 1000000) DIV (n * s) AS BIGINT)"
        ).alias("gini_ppm"),
    )


_BUDGET = 1_000_000

# Hamilton / largest-remainder apportionment of a fixed integer budget
# across nations, weighted by order revenue routed through customer
# nationality. base_i = ⌊B·w_i / W⌋ leaves L = B − Σ base_i units;
# the L largest remainders (B·w_i mod W, nationkey tiebreak) get one
# extra unit each — Σ alloc = B exactly, the defining law.
_ALLOC_ORACLE = f"""
WITH w AS (
  SELECT n.n_nationkey, n.n_name,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
shares AS (
  SELECT n_nationkey, n_name, cents,
         ({_BUDGET} * cents) // SUM(cents) OVER () AS base_units,
         ({_BUDGET} * cents) % SUM(cents) OVER () AS remainder
  FROM w
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY remainder DESC, n_nationkey ASC)
           AS rem_rank,
         {_BUDGET} - SUM(base_units) OVER () AS leftover
  FROM shares
)
SELECT n_name,
       CAST(cents AS BIGINT) AS cents,
       CAST(base_units AS BIGINT) AS base_units,
       CAST(base_units + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc_units
FROM ranked
"""


@register("alloc_largest_remainder", _ALLOC_ORACLE)
def alloc_largest_remainder(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", cents("o_totalprice").alias("cents")
    )
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    w = (
        o.join(F.broadcast(c), "o_custkey")
        .join(F.broadcast(n), "c_nationkey")
        .groupBy(F.col("c_nationkey").alias("n_nationkey"), "n_name")
        .agg(F.sum("cents").alias("cents"))
    )
    # 25 pre-reduced rows: the empty-partition windows are the tiny
    # scalar-total shape, not a data-scale single-partition sort
    w_all = Window.partitionBy()
    shares = w.select(
        "n_nationkey",
        "n_name",
        "cents",
        F.expr(f"({_BUDGET} * cents) DIV SUM(cents) OVER ()").alias(
            "base_units"
        ),
        F.expr(f"({_BUDGET} * cents) % SUM(cents) OVER ()").alias("remainder"),
    )
    ranked = shares.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.desc("remainder"), F.asc("n_nationkey")))
        .alias("rem_rank"),
        (F.lit(_BUDGET) - F.sum("base_units").over(w_all)).alias("leftover"),
    )
    return ranked.select(
        "n_name",
        F.col("cents").cast("bigint").alias("cents"),
        F.col("base_units").cast("bigint").alias("base_units"),
        (
            F.col("base_units")
            + F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_units"),
    )
