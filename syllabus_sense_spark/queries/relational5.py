"""Relational batch 5: market-basket co-occurrence — which part pairs
appear in the same order (the co-purchase/association-rule input).

Shape at scale: pair generation is the shared single-shuffle basket
pairing (ext_graph3.copurchase_pairs — collect_set groups and dedups
the basket in one shuffle, ordered pairs are generated map-side from
the sorted array), NOT a corpus cross join; per-order item counts are
bounded so the k² fan-out is small and skew-free. The final count
aggregates on the bounded (part_a, part_b) key space; top-k with a
total tiebreak order keeps the output deterministic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_BASKET_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM pairs
GROUP BY part_a, part_b
ORDER BY n_orders DESC, part_a ASC, part_b ASC
LIMIT 25
"""


@register("basket_part_pairs", _BASKET_ORACLE)
def basket_part_pairs(spark, sf_dir):
    from .ext_graph3 import copurchase_pairs

    pairs = copurchase_pairs(spark, sf_dir).select(
        F.col("pa").alias("part_a"), F.col("pb").alias("part_b")
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(
            F.col("n_orders").desc(), F.col("part_a").asc(), F.col("part_b").asc()
        )
        .limit(25)
    )




# --------------------------------------------------------------------------
# RFM customer segmentation — the classic marketing-analytics shape:
# per customer, Recency (days since last order, against the corpus
# max date so the metric is closed over the dataset), Frequency
# (order count), Monetary (exact-decimal total spend), each cut into
# NTILE(4) quartiles over a totally-ordered ranking (metric +
# custkey tiebreak → the quartile assignment is deterministic in
# both engines even at equal metric values).
#
# Scale shape: one groupBy(custkey) over orders (map-side combined),
# the corpus max date is a 1-row broadcast scalar, and the three
# ntile windows order the CUSTOMER-level table (one row per
# customer, ≪ orders). At 1000× the customer table still windows in
# one pass; only the orders aggregate scales with data volume.
# --------------------------------------------------------------------------

_RFM_ORACLE = """
WITH maxd AS (SELECT MAX(o_orderdate) AS d FROM orders),
cust AS (
  SELECT o_custkey AS custkey,
         CAST(date_diff('day', MAX(o_orderdate), (SELECT d FROM maxd)) AS BIGINT)
           AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
)
SELECT custkey, recency_days, frequency, monetary,
       CAST(NTILE(4) OVER (ORDER BY recency_days, custkey) AS BIGINT) AS r_quartile,
       CAST(NTILE(4) OVER (ORDER BY frequency DESC, custkey) AS BIGINT) AS f_quartile,
       CAST(NTILE(4) OVER (ORDER BY monetary DESC, custkey) AS BIGINT) AS m_quartile
FROM cust
"""


@register("customer_rfm_segments", _RFM_ORACLE)
def customer_rfm_segments(spark, sf_dir):
    from pyspark.sql import Window

    from ._util import cents, dec2, xsum

    o = load(spark, sf_dir, "orders")
    maxd = o.agg(F.max("o_orderdate").alias("d"))
    cust = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            xsum(cents("o_totalprice"), 2, 18).alias("monetary"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "custkey",
            F.datediff(F.col("d"), F.col("last_order"))
            .cast("bigint")
            .alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    wr = Window.orderBy("recency_days", "custkey")
    wf = Window.orderBy(F.col("frequency").desc(), "custkey")
    wm = Window.orderBy(F.col("monetary").desc(), "custkey")
    return cust.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4).over(wr).cast("long").alias("r_quartile"),
        F.ntile(4).over(wf).cast("long").alias("f_quartile"),
        F.ntile(4).over(wm).cast("long").alias("m_quartile"),
    )
