"""Chi-square independence screen: is event_type distribution
independent of weekend vs weekday? The drift/bias check a curation
pipeline runs before trusting a time-sliced sample.

Exactness: the textbook Σ (obs − exp)²/exp needs float expected
counts. Multiplying through by the grand total g gives the identical
statistic as (obs·g − row·col)² / (g·row·col) per cell — an integer
numerator and denominator. Each cell's term is floor-scaled to ppm
(one fixed-order IEEE double division per cell, the HHI discipline
from SCALE.md) and summed as integers — order-free, bit-identical in
both engines. Intermediates reach (obs·g)² ≈ 1e23 at sf0.1, so both
sides widen to DECIMAL(38,0)/HUGEINT before squaring.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import epoch_us

_US_PER_DAY = 86_400_000_000

_CHISQ_ORACLE = f"""
WITH cells AS (
  SELECT event_type,
         CAST(CASE WHEN (epoch_us(ts) // {_US_PER_DAY} + 3) % 7 >= 5
              THEN 1 ELSE 0 END AS INT) AS is_weekend,
         COUNT(*) AS obs
  FROM events GROUP BY 1, 2
),
margins AS (
  SELECT event_type, is_weekend, obs,
         SUM(obs) OVER (PARTITION BY event_type) AS row_tot,
         SUM(obs) OVER (PARTITION BY is_weekend) AS col_tot,
         SUM(obs) OVER () AS g
  FROM cells
),
terms AS (
  SELECT event_type, is_weekend, obs, row_tot, col_tot, g,
         CAST(FLOOR(
           CAST((CAST(obs AS HUGEINT) * g - CAST(row_tot AS HUGEINT)
                 * col_tot)
                * (CAST(obs AS HUGEINT) * g - CAST(row_tot AS HUGEINT)
                   * col_tot) AS DOUBLE)
           * 1000000.0
           / CAST(CAST(g AS HUGEINT) * row_tot * col_tot AS DOUBLE)
         ) AS BIGINT) AS term_ppm
  FROM margins
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(MAX(g) AS BIGINT) AS n_events,
       CAST((COUNT(DISTINCT event_type) - 1)
            * (COUNT(DISTINCT is_weekend) - 1) AS BIGINT) AS dof,
       CAST(SUM(term_ppm) AS BIGINT) AS chisq_ppm
FROM terms
"""


@register("dq_chisq_independence", _CHISQ_ORACLE)
def dq_chisq_independence(spark, sf_dir):
    cells = (
        load(spark, sf_dir, "events")
        .select("event_type", epoch_us(F.col("ts")).alias("us"))
        .select(
            "event_type",
            F.expr(
                f"CAST(CASE WHEN (us DIV {_US_PER_DAY} + 3) % 7 >= 5"
                " THEN 1 ELSE 0 END AS INT)"
            ).alias("is_weekend"),
        )
        .groupBy("event_type", "is_weekend")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    # margins over the tiny pre-reduced cell table (types × 2 rows)
    margins = cells.select(
        "event_type",
        "is_weekend",
        "obs",
        F.sum("obs").over(Window.partitionBy("event_type")).alias("row_tot"),
        F.sum("obs").over(Window.partitionBy("is_weekend")).alias("col_tot"),
        F.sum("obs").over(Window.partitionBy()).alias("g"),
    )
    terms = margins.select(
        "event_type",
        "is_weekend",
        F.expr(
            "CAST(FLOOR("
            " CAST((CAST(obs AS DECIMAL(38,0)) * g"
            "       - CAST(row_tot AS DECIMAL(38,0)) * col_tot)"
            "      * (CAST(obs AS DECIMAL(38,0)) * g"
            "         - CAST(row_tot AS DECIMAL(38,0)) * col_tot) AS DOUBLE)"
            " * 1000000.0"
            " / CAST(CAST(g AS DECIMAL(38,0)) * row_tot * col_tot AS DOUBLE)"
            ") AS BIGINT)"
        ).alias("term_ppm"),
        "g",
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.max("g").cast("bigint").alias("n_events"),
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("is_weekend") - 1)
        )
        .cast("bigint")
        .alias("dof"),
        F.sum("term_ppm").cast("bigint").alias("chisq_ppm"),
    )
