"""DQ batch 5 — duplicate-payment screen: orders by the same customer
for the same amount within 24 hours are suspected double-submissions
(the accounts-payable audit classic). The detector is a LAG window on
the natural key (custkey, exact cents) ordered by time — duplicates
cluster on the key, so no self-join and no pair blow-up; at 100 TB
this is one shuffle on a two-column key.

Output: per order-month, suspected duplicate count and the exposed
cents (the later order of each adjacent pair counts as the
duplicate; chains of k same-amount orders inside the window flag
k−1 — each counted against its predecessor)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2, epoch_us

_US_PER_DAY = 86_400_000_000

_DUP_ORDERS_ORACLE = f"""
WITH o AS (
  SELECT o_custkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         epoch_us(o_orderdate) AS us,
         o_orderkey
  FROM orders
),
flagged AS (
  SELECT us, cents,
         CASE WHEN us - LAG(us) OVER w <= {_US_PER_DAY} THEN 1 ELSE 0 END
           AS is_dup
  FROM o
  WINDOW w AS (PARTITION BY o_custkey, cents ORDER BY us, o_orderkey)
)
SELECT CAST(us // ({_US_PER_DAY} * 30) AS BIGINT) AS month_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(is_dup) AS BIGINT) AS n_suspected_dups,
       CAST(SUM(CASE WHEN is_dup = 1 THEN cents ELSE 0 END) AS BIGINT)
         AS exposed_cents
FROM flagged GROUP BY 1
"""


@register("dq_suspected_duplicate_orders", _DUP_ORDERS_ORACLE)
def dq_suspected_duplicate_orders(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        cents("o_totalprice").alias("cents"),
        epoch_us(F.col("o_orderdate")).alias("us"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey", "cents").orderBy("us", "o_orderkey")
    flagged = o.select(
        "us",
        "cents",
        F.when(
            F.col("us") - F.lag("us").over(w) <= _US_PER_DAY, 1
        )
        .otherwise(0)
        .alias("is_dup"),
    )
    return flagged.groupBy(
        F.expr(f"us DIV ({_US_PER_DAY} * 30)").alias("month_bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("is_dup").cast("bigint").alias("n_suspected_dups"),
        F.sum(F.when(F.col("is_dup") == 1, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("exposed_cents"),
    )
