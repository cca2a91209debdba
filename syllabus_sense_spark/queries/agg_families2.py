"""Aggregate families batch 2: deterministic MODE.

``MODE()`` is nondeterministic under ties in both Spark and DuckDB,
so the engine exposes the deterministic formulation every SQL dialect
can agree on: count per (group, value), then argmax with an explicit
total tiebreak order. One shuffle on the (group, value) pair, then a
tiny window over per-group counts — the count table is bounded by the
value domain, not the fact-table size, so the shape holds at any
volume.

Reference anchor: the reference's logged "most common" style
diagnostics are count-based (syllabus_ai_graph.py:82-84); this is the
engine-grade equivalent with defined tie semantics.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register

_MODE_ORACLE = """
WITH counts AS (
  SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
),
ranked AS (
  SELECT o_orderpriority, o_orderstatus, n,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY n DESC, o_orderstatus ASC) AS rn
  FROM counts
)
SELECT o_orderpriority, o_orderstatus AS modal_status, n AS n_orders
FROM ranked WHERE rn = 1
"""


@register("agg_mode_deterministic", _MODE_ORACLE)
def agg_mode_deterministic(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("n").desc(), F.col("o_orderstatus").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("modal_status"),
            F.col("n").alias("n_orders"),
        )
    )
