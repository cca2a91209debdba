"""Aggregate families, batch 5: robust means — trimmed and
winsorized — per order priority.

Two passes: pass 1 computes the P5/P95 cutoffs per group with
``percentile_disc`` (value-selecting, so exact — the
``agg_families3.py`` discipline; Spark surfaces the result as DOUBLE,
cast back to BIGINT cents per the SCALE.md trap list). The tiny
cutoff table broadcasts back onto the scan and one conditional
aggregation computes both robust means as exact integer floor
divisions. Interior is inclusive ([p5, p95]) on both sides — the
convention the oracle shares.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2

_ROBUST_ORACLE = """
WITH o AS (
  SELECT o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
cuts AS (
  SELECT o_orderpriority,
         CAST(quantile_disc(cents, 0.05) AS BIGINT) AS p5,
         CAST(quantile_disc(cents, 0.95) AS BIGINT) AS p95
  FROM o GROUP BY o_orderpriority
)
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MAX(c.p5) AS BIGINT) AS p5_cents,
       CAST(MAX(c.p95) AS BIGINT) AS p95_cents,
       CAST(SUM(cents) // COUNT(*) AS BIGINT) AS mean_cents,
       CAST(SUM(CASE WHEN cents BETWEEN c.p5 AND c.p95 THEN cents END)
            // COUNT(CASE WHEN cents BETWEEN c.p5 AND c.p95 THEN 1 END)
            AS BIGINT) AS trimmed_mean_cents,
       CAST(SUM(LEAST(GREATEST(cents, c.p5), c.p95)) // COUNT(*) AS BIGINT)
         AS winsorized_mean_cents
FROM o JOIN cuts c ON c.o_orderpriority = o.o_orderpriority
GROUP BY o.o_orderpriority
"""


@register("agg_trimmed_winsorized", _ROBUST_ORACLE)
def agg_trimmed_winsorized(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        cents("o_totalprice").alias("cents"),
    )

    def pd(p):
        return (
            F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY cents)")
            .cast("bigint")
        )

    cuts = o.groupBy("o_orderpriority").agg(
        pd(0.05).alias("p5"), pd(0.95).alias("p95")
    )
    joined = o.join(F.broadcast(cuts), "o_orderpriority")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.max("p5").cast("bigint").alias("p5_cents"),
        F.max("p95").cast("bigint").alias("p95_cents"),
        F.expr("CAST(SUM(cents) DIV COUNT(*) AS BIGINT)").alias("mean_cents"),
        F.expr(
            "CAST(SUM(CASE WHEN cents BETWEEN p5 AND p95 THEN cents END)"
            " DIV COUNT(CASE WHEN cents BETWEEN p5 AND p95 THEN 1 END)"
            " AS BIGINT)"
        ).alias("trimmed_mean_cents"),
        F.expr(
            "CAST(SUM(LEAST(GREATEST(cents, p5), p95)) DIV COUNT(*)"
            " AS BIGINT)"
        ).alias("winsorized_mean_cents"),
    )
