"""Distribution reports over the order hierarchy: basket-size
histogram (lines per order — the classic order-profile report) and
the two-level revenue share tree (nation share of region, region
share of total) every sales dashboard leads with.

Both reduce the fact table once and run every window on reduced
tables (|orders|-level counts → |distinct sizes| rows; |nations|
rows). Shares are exact integer ppm.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2

_BASKET_ORACLE = """
WITH per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem GROUP BY l_orderkey
),
hist AS (
  SELECT n_lines, COUNT(*) AS n_orders FROM per_order GROUP BY n_lines
)
SELECT CAST(n_lines AS BIGINT) AS n_lines,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(n_orders * 1000000 // (SELECT SUM(n_orders) FROM hist)
            AS BIGINT) AS share_ppm
FROM hist
"""


@register("orders_basket_size_histogram", _BASKET_ORACLE)
def orders_basket_size_histogram(spark, sf_dir):
    per_order = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    hist = per_order.groupBy("n_lines").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    total = hist.agg(F.sum("n_orders").alias("total"))
    return hist.join(F.broadcast(total)).select(
        F.col("n_lines").cast("bigint").alias("n_lines"),
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.expr("n_orders * 1000000 DIV total").alias("share_ppm"),
    )


_SHARE_TREE_ORACLE = """
WITH rev AS (
  SELECT n.n_nationkey, n.n_name AS nation, r.r_name AS region,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY 1, 2, 3
)
SELECT nation, region, cents,
       CAST(FLOOR(CAST(cents AS DOUBLE) * 1000000.0
                  / CAST(SUM(cents) OVER (PARTITION BY region) AS DOUBLE))
            AS BIGINT) AS share_of_region_ppm,
       CAST(FLOOR(CAST(SUM(cents) OVER (PARTITION BY region) AS DOUBLE)
                  * 1000000.0 / CAST(SUM(cents) OVER () AS DOUBLE))
            AS BIGINT) AS region_share_ppm
FROM rev
"""


@register("sales_share_hierarchy", _SHARE_TREE_ORACLE)
def sales_share_hierarchy(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", cents("o_totalprice").alias("c")
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            "n_nationkey",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
        .agg(F.sum("c").cast("bigint").alias("cents"))
    )
    # shares as the documented fixed-order IEEE floor-ppm: the BIGINT
    # product cents·1e6 overflows at ~9.2e12 total cents, so the
    # double form is the scale-safe one (operands are exact integers,
    # both engines round the identical expression tree)
    return rev.select(
        "nation",
        "region",
        "cents",
        F.expr(
            "CAST(FLOOR(CAST(cents AS DOUBLE) * 1000000.0"
            " / CAST(SUM(cents) OVER (PARTITION BY region) AS DOUBLE))"
            " AS BIGINT)"
        ).alias("share_of_region_ppm"),
        F.expr(
            "CAST(FLOOR(CAST(SUM(cents) OVER (PARTITION BY region) AS DOUBLE)"
            " * 1000000.0 / CAST(SUM(cents) OVER () AS DOUBLE))"
            " AS BIGINT)"
        ).alias("region_share_ppm"),
    )


_REPEAT_ORACLE = """
WITH cy AS (
  SELECT year(o_orderdate) AS yr, o_custkey, COUNT(*) AS n_orders
  FROM orders GROUP BY 1, 2
)
SELECT CAST(yr AS INT) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat,
       CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS repeat_ppm
FROM cy GROUP BY yr
"""


@register("orders_repeat_purchase_rate", _REPEAT_ORACLE)
def orders_repeat_purchase_rate(spark, sf_dir):
    """Repeat-purchase rate per calendar year — the loyalty KPI next
    to `orders_cohort_ltv`: share of that year's active customers who
    ordered at least twice. One per-(year, customer) reduce, then a
    map-side-combined year rollup; exact integer ppm."""
    cy = (
        load(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("yr"), "o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return cy.groupBy("yr").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0)).alias(
            "n_repeat"
        ),
    ).select(
        F.col("yr").cast("int").alias("yr"),
        F.col("n_customers").cast("bigint").alias("n_customers"),
        F.col("n_repeat").cast("bigint").alias("n_repeat"),
        F.expr("n_repeat * 1000000 DIV n_customers").alias("repeat_ppm"),
    )
