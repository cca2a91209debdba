"""Weighted median — the ordered-set aggregate family's last gap.

`agg_percentile_disc` / `agg_percentiles_exact` compute unweighted
order statistics and `pandas_udaf_median_value` the Python-seam
median; none handles WEIGHTED quantiles, which is what pricing /
capacity analyses actually need (median price per unit SOLD, not per
order line). No engine has a portable built-in, so this is the
canonical distributed formulation: sort within group, running weight
cumsum, first value where 2·cumweight ≥ total weight (the lower
weighted median — exact, no interpolation).

Exactness discipline: weights are whole-number quantities cast to
BIGINT, values are DECIMAL(18,2); the threshold comparison
``2·cum ≥ tot`` is pure integer arithmetic, so both engines pick the
identical row. The value's total order includes the value itself
only — ties in value are interchangeable for a median, and the
cumsum frame is RANGE-by-value (ties collapse), making the answer
independent of intra-tie order.

Scale posture: one hash shuffle on the group key; the window cumsum
and the argmin both run within the group partition (the same
single-shuffle shape as the SCD2 builder). Skewed groups sort
locally — spill-safe, no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import dec2

_WMEDIAN_ORACLE = """
WITH w AS (
  SELECT l_returnflag AS flag,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS val,
         CAST(l_quantity AS BIGINT) AS wt
  FROM lineitem
),
cum AS (
  SELECT flag, val, wt,
         SUM(wt) OVER (
           PARTITION BY flag ORDER BY val
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cw,
         SUM(wt) OVER (PARTITION BY flag) AS tot
  FROM w
)
SELECT flag AS l_returnflag,
       CAST(MIN(val) AS DOUBLE) AS weighted_median_price,
       CAST(MAX(tot) AS BIGINT) AS total_weight
FROM cum
WHERE 2 * cw >= tot
GROUP BY flag
"""


@register("agg_weighted_median", _WMEDIAN_ORACLE)
def agg_weighted_median(spark, sf_dir):
    w = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        dec2("l_extendedprice").alias("val"),
        F.col("l_quantity").cast("bigint").alias("wt"),
    )
    win = (
        Window.partitionBy("flag")
        .orderBy("val")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = w.select(
        "flag",
        "val",
        F.sum("wt").over(win).alias("cw"),
        F.sum("wt").over(Window.partitionBy("flag")).alias("tot"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tot"))
        .groupBy(F.col("flag").alias("l_returnflag"))
        .agg(
            F.min("val").cast("double").alias("weighted_median_price"),
            F.max("tot").cast("bigint").alias("total_weight"),
        )
    )
