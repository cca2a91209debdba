"""Customer segment migration — year-over-year movement between
spend terciles (the churn/upsell transition matrix account teams
live in). Per year, customers rank into LOW/MID/HIGH terciles by
exact-cents spend (NTILE over the per-customer-year reduce — the
pre-aggregated ranking posture of `customer_revenue_concentration`);
consecutive-year pairs then count transitions, including entries
(new customers, from-segment '(new)') and exits (to-segment
'(gone)') — a migration report that doesn't show entries/exits
hides exactly the customers that matter.

Exact: integer cents, integer year index, NTILE determinism via the
(cents DESC, custkey ASC) total order; the transition join is keyed
on (custkey) per adjacent-year pair via a self-join of the reduced
customer-year table (|customers|·|years| rows, orders of magnitude
below the fact table).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2, xsum_total

_MIGRATION_ORACLE = """
WITH cy AS (
  SELECT o_custkey, year(o_orderdate) AS yr,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
),
seg AS (
  SELECT o_custkey, yr,
         CASE NTILE(3) OVER (PARTITION BY yr
                             ORDER BY cents DESC, o_custkey ASC)
           WHEN 1 THEN 'HIGH' WHEN 2 THEN 'MID' ELSE 'LOW' END AS segment
  FROM cy
),
pairs AS (
  SELECT a.yr AS yr_from,
         COALESCE(a.segment, '(new)') AS seg_from,
         COALESCE(b.segment, '(gone)') AS seg_to
  FROM seg a
  LEFT JOIN seg b ON b.o_custkey = a.o_custkey AND b.yr = a.yr + 1
  UNION ALL
  SELECT b.yr - 1, '(new)', b.segment
  FROM seg b
  WHERE NOT EXISTS (SELECT 1 FROM seg a
                    WHERE a.o_custkey = b.o_custkey AND a.yr = b.yr - 1)
)
SELECT CAST(yr_from AS INT) AS yr_from, seg_from, seg_to,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM pairs GROUP BY 1, 2, 3
"""


@register("orders_segment_migration", _MIGRATION_ORACLE)
def orders_segment_migration(spark, sf_dir):
    cy = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey", F.year("o_orderdate").alias("yr"))
        .agg(xsum_total(cents("o_totalprice")).cast("long").alias("cents"))
    )
    w = Window.partitionBy("yr").orderBy(F.desc("cents"), F.asc("o_custkey"))
    seg = cy.select(
        "o_custkey",
        "yr",
        F.when(F.ntile(3).over(w) == 1, "HIGH")
        .when(F.ntile(3).over(w) == 2, "MID")
        .otherwise("LOW")
        .alias("segment"),
    )
    a = seg.alias("a")
    b = seg.alias("b")
    fwd = a.join(
        b,
        (F.col("b.o_custkey") == F.col("a.o_custkey"))
        & (F.col("b.yr") == F.col("a.yr") + 1),
        "left",
    ).select(
        F.col("a.yr").alias("yr_from"),
        F.col("a.segment").alias("seg_from"),
        F.coalesce(F.col("b.segment"), F.lit("(gone)")).alias("seg_to"),
    )
    entries = (
        b.join(
            a,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.yr") == F.col("b.yr") - 1),
            "left_anti",
        )
        .select(
            (F.col("yr") - 1).alias("yr_from"),
            F.lit("(new)").alias("seg_from"),
            F.col("segment").alias("seg_to"),
        )
    )
    return (
        fwd.unionByName(entries)
        .groupBy("yr_from", "seg_from", "seg_to")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .select(
            F.col("yr_from").cast("int").alias("yr_from"),
            "seg_from",
            "seg_to",
            "n_customers",
        )
    )
