"""Rank-movement tracking — monthly part revenue leaderboard with
rank deltas ("movers and shakers"): two stacked window families, the
per-month dense ranking and the per-part month-over-month carry
(contiguity-checked lag, so a part absent for a month restarts
rather than comparing across the gap). The report every
merchandising dashboard runs, and a two-window composition the
single-window queries don't cover.

Exact: cents ranking with total (cents DESC, partkey ASC) tiebreaks;
month index = year·12+month integer arithmetic; output bounded to
the monthly top-20 at any scale (ranks computed over all parts, so
`prev_rank` is honest even when a part fell out of the top-20).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2, xsum_total

_TOP = 20

_MOVERS_ORACLE = f"""
WITH m AS (
  SELECT l_partkey,
         year(l_shipdate) * 12 + month(l_shipdate) AS midx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM lineitem GROUP BY 1, 2
),
ranked AS (
  SELECT l_partkey, midx, cents,
         ROW_NUMBER() OVER (
           PARTITION BY midx ORDER BY cents DESC, l_partkey ASC
         ) AS rnk
  FROM m
),
carried AS (
  SELECT l_partkey, midx, cents, rnk,
         CASE WHEN LAG(midx) OVER w = midx - 1
              THEN LAG(rnk) OVER w END AS prev_rank
  FROM ranked
  WINDOW w AS (PARTITION BY l_partkey ORDER BY midx)
)
SELECT CAST(midx AS BIGINT) AS midx,
       CAST(l_partkey AS BIGINT) AS part_key,
       CAST(rnk AS BIGINT) AS rnk,
       CAST(prev_rank AS BIGINT) AS prev_rank,
       CAST(prev_rank - rnk AS BIGINT) AS rank_gain
FROM carried WHERE rnk <= {_TOP}
"""


@register("window_rank_movers", _MOVERS_ORACLE)
def window_rank_movers(spark, sf_dir):
    m = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            "l_partkey",
            (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("midx"),
        )
        .agg(
            xsum_total(cents("l_extendedprice"))
            .cast("long")
            .alias("cents")
        )
    )
    w_rank = Window.partitionBy("midx").orderBy(
        F.desc("cents"), F.asc("l_partkey")
    )
    ranked = m.withColumn("rnk", F.row_number().over(w_rank))
    w_carry = Window.partitionBy("l_partkey").orderBy("midx")
    carried = ranked.withColumn(
        "prev_rank",
        F.when(
            F.lag("midx").over(w_carry) == F.col("midx") - 1,
            F.lag("rnk").over(w_carry),
        ),
    )
    return carried.filter(F.col("rnk") <= _TOP).select(
        F.col("midx").cast("bigint").alias("midx"),
        F.col("l_partkey").cast("bigint").alias("part_key"),
        F.col("rnk").cast("bigint").alias("rnk"),
        F.col("prev_rank").cast("bigint").alias("prev_rank"),
        (F.col("prev_rank") - F.col("rnk")).cast("bigint").alias("rank_gain"),
    )
