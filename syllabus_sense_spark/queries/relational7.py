"""Cohort LTV curve — customers grouped by FIRST-order month, revenue
tracked by months-since-acquisition: the lifetime-value companion to
`events_cohort_retention` (which counts users on the event stream;
this follows money on the order fact table across the full 1995-2001
history).

Month index is exact integer arithmetic (year·12 + month), so
months_since never touches date subtraction semantics. Two shuffles
total: the per-customer first-order reduce, and the join of orders
back to their cohort (both keyed on o_custkey); the cumulative-LTV
window runs on the pre-reduced (cohort × months_since) table
(~80×80 rows at any data scale).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2

_LTV_ORACLE = """
WITH o AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) AS midx,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
cohort AS (
  SELECT o_custkey, MIN(midx) AS cohort_midx FROM o GROUP BY o_custkey
),
cells AS (
  SELECT c.cohort_midx, o.midx - c.cohort_midx AS months_since,
         COUNT(DISTINCT o.o_custkey) AS n_active,
         SUM(o.cents) AS cents
  FROM o JOIN cohort c ON c.o_custkey = o.o_custkey
  GROUP BY 1, 2
)
SELECT CAST(cohort_midx AS BIGINT) AS cohort_midx,
       CAST(months_since AS BIGINT) AS months_since,
       CAST(n_active AS BIGINT) AS n_active,
       CAST(cents AS BIGINT) AS cents,
       CAST(SUM(cents) OVER (
         PARTITION BY cohort_midx ORDER BY months_since
         ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS cum_cents
FROM cells
"""


@register("orders_cohort_ltv", _LTV_ORACLE)
def orders_cohort_ltv(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("midx"),
        cents("o_totalprice").alias("cents"),
    )
    cohort = o.groupBy("o_custkey").agg(F.min("midx").alias("cohort_midx"))
    cells = (
        o.join(cohort, "o_custkey")
        .groupBy(
            "cohort_midx",
            (F.col("midx") - F.col("cohort_midx")).alias("months_since"),
        )
        .agg(
            F.count_distinct("o_custkey").alias("n_active"),
            F.sum("cents").alias("cents"),
        )
    )
    w = Window.partitionBy("cohort_midx").orderBy("months_since").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return cells.select(
        F.col("cohort_midx").cast("bigint").alias("cohort_midx"),
        F.col("months_since").cast("bigint").alias("months_since"),
        F.col("n_active").cast("bigint").alias("n_active"),
        F.col("cents").cast("bigint").alias("cents"),
        F.sum("cents").over(w).cast("bigint").alias("cum_cents"),
    )


_WATERFALL_ORACLE = """
WITH agg AS (
  SELECT
    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS gross,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(3,2)))
      AS discounted,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(3,2))
        * CAST(1 + CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(3,2)))
      AS net
  FROM lineitem
)
SELECT * FROM (
  SELECT 1 AS step, 'gross' AS component, CAST(gross AS DOUBLE) AS amount
  FROM agg
  UNION ALL
  SELECT 2, 'discount_effect', CAST(discounted - gross AS DOUBLE) FROM agg
  UNION ALL
  SELECT 3, 'tax_effect', CAST(net - discounted AS DOUBLE) FROM agg
  UNION ALL
  SELECT 4, 'net', CAST(net AS DOUBLE) FROM agg
)
"""


@register("orders_revenue_waterfall", _WATERFALL_ORACLE)
def orders_revenue_waterfall(spark, sf_dir):
    """Revenue decomposition waterfall — q1's charge expression split
    into additive steps (gross → discount effect → tax effect → net),
    the explainability report on top of the same exact-decimal
    aggregation. The taxed sum carries decimal scale 6, so NO integer
    scaling is exact; instead each emitted amount is an exact decimal
    sum/difference with ONE final cast to double (the house float
    discipline — bit-identical across engines). ONE scan, one 1-row
    aggregate, stack-unpivoted to the 4 waterfall rows."""
    from ._util import cents, hundredths, xsum_dec

    l = load(spark, sf_dir, "lineitem")
    pc = cents("l_extendedprice")
    dp = pc * hundredths("l_discount")
    ch = dp * hundredths("l_tax", plus=True)
    # xsum_dec keeps the decimal result types ((28,2)/(32,4)/(36,6))
    # so the stack expression's decimal differences and casts below
    # are unchanged — only the per-row aggregation went scaled-long
    agg = l.agg(
        xsum_dec(pc, 2, 18).alias("gross"),
        xsum_dec(dp, 4, 22).alias("discounted"),
        xsum_dec(ch, 6, 26).alias("net"),
    )
    return agg.select(
        F.expr(
            "stack(4,"
            " 1, 'gross', CAST(gross AS DOUBLE),"
            " 2, 'discount_effect', CAST(discounted - gross AS DOUBLE),"
            " 3, 'tax_effect', CAST(net - discounted AS DOUBLE),"
            " 4, 'net', CAST(net AS DOUBLE)) AS (step, component, amount)"
        )
    ).select(
        F.col("step").cast("int").alias("step"),
        "component",
        F.col("amount").cast("double").alias("amount"),
    )
