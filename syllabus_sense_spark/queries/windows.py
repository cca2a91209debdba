"""Window-function surface (SURVEY.md §2 Table B: ranking, running and
frame aggregates, lag/lead, first/last).

Reference parity: the batch-pagination cursor (A10) is row_number
pagination; the stuck-position safeguard (A17) is lag; the sessionizer
(A5) is a running sum — all expressed here over the star schema.

Scale note: every window below is partitioned by a real key
(customer, brand) — no global ``Window.orderBy()`` without
``partitionBy`` anywhere, because that is a single-partition sort at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2, scaled_to_double, xsum, xsum_total

_RANK_ORACLE = """
SELECT p_brand, p_partkey, p_name, p_retailprice, rnk
FROM (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                                 ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rnk
  FROM part
) t
WHERE rnk <= 3
"""


@register("window_rank_topk_per_group", _RANK_ORACLE)
def window_rank_topk_per_group(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        p.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rnk")
    )


_RUNNING_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  o_orderdate,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS running_spend,
  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS order_seq
FROM orders
"""


@register("window_running_total", _RUNNING_ORACLE)
def window_running_total(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        xsum(cents("o_totalprice"), 2, 18, over=frame).alias("running_spend"),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


_LAG_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  o_orderdate,
  CAST(date_diff('day',
                 CAST(LAG(o_orderdate) OVER w AS DATE),
                 CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev,
  CAST(LEAD(o_orderkey) OVER w AS BIGINT) AS next_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("window_lag_lead_gaps", _LAG_ORACLE)
def window_lag_lead_gaps(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("days_since_prev"),
        F.lead("o_orderkey").over(w).cast("long").alias("next_orderkey"),
    )


_MOVING_ORACLE = """
WITH daily AS (
  SELECT
    CAST(o_orderdate AS DATE) AS order_day,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_value,
    COUNT(*) AS n_orders
  FROM orders
  GROUP BY CAST(o_orderdate AS DATE)
)
SELECT
  order_day,
  n_orders,
  CAST(day_value AS DOUBLE) AS day_value,
  CAST(SUM(day_value) OVER w AS DOUBLE)
    / CAST(COUNT(*) OVER w AS DOUBLE) AS moving_avg_7d
FROM daily
WINDOW w AS (ORDER BY order_day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@register("window_moving_average", _MOVING_ORACLE)
def window_moving_average(spark, sf_dir):
    # Daily pre-aggregation shrinks the input to ~2500 rows, so the
    # single-partition ordered window on top is safe at any scale —
    # the pattern for global time-series windows: reduce first.
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("order_day")).agg(
        # exact per-day total in cents (scaled long) — the 7-day frame
        # then sums plain longs, and both outputs reconstruct the
        # decimal types the old plan produced ((28,2) per day, (38,2)
        # per frame) before the final double cast
        xsum_total(cents("o_totalprice")).cast("long").alias("day_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("order_day").rowsBetween(-6, Window.currentRow)
    return daily.select(
        "order_day",
        "n_orders",
        scaled_to_double(F.col("day_cents"), 2, 28).alias("day_value"),
        (
            scaled_to_double(F.sum("day_cents").over(w), 2, 38)
            / F.count(F.lit(1)).over(w).cast("double")
        ).alias("moving_avg_7d"),
    )


_FIRST_LAST_ORACLE = """
WITH ranked AS (
  SELECT
    o_custkey, o_orderkey, o_orderdate,
    ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS rn_a,
    ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_d
  FROM orders
)
SELECT
  o_custkey,
  CAST(MAX(CASE WHEN rn_a = 1 THEN o_orderkey END) AS BIGINT) AS first_orderkey,
  CAST(MAX(CASE WHEN rn_d = 1 THEN o_orderkey END) AS BIGINT) AS last_orderkey,
  MIN(o_orderdate) AS first_orderdate,
  MAX(o_orderdate) AS last_orderdate,
  COUNT(*) AS n_orders
FROM ranked
GROUP BY o_custkey
"""


@register("window_first_last_order", _FIRST_LAST_ORACLE)
def window_first_last_order(spark, sf_dir):
    # first/last per key with a deterministic total order (date, key):
    # expressed as min_by/max_by on the composite — one hash agg, no
    # window shuffle-and-sort needed.
    o = load(spark, sf_dir, "orders")
    key = F.struct("o_orderdate", "o_orderkey")
    return o.groupBy("o_custkey").agg(
        F.min_by("o_orderkey", key).cast("long").alias("first_orderkey"),
        F.max_by("o_orderkey", key).cast("long").alias("last_orderkey"),
        F.min("o_orderdate").alias("first_orderdate"),
        F.max("o_orderdate").alias("last_orderdate"),
        F.count(F.lit(1)).alias("n_orders"),
    )


_NTILE_ORACLE = """
SELECT
  o_orderkey,
  o_totalprice,
  CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS price_quartile,
  CAST(CUME_DIST() OVER (ORDER BY o_totalprice) AS DOUBLE) AS price_cume
FROM orders
WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
"""


@register("window_ntile_distribution", _NTILE_ORACLE)
def window_ntile_distribution(spark, sf_dir):
    # Global ordered window, but over a pre-filtered slice (the
    # reduce-first pattern again).
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_orderpriority") == "1-URGENT")
    )
    w = Window.orderBy("o_totalprice", "o_orderkey")
    wc = Window.orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_totalprice",
        F.ntile(4).over(w).cast("long").alias("price_quartile"),
        F.cume_dist().over(wc).cast("double").alias("price_cume"),
    )
