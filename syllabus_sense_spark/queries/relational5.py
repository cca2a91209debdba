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


