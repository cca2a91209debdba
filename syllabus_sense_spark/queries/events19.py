"""Linear-interpolation gap fill — the upgrade of
`events_gapfill_forward` (LOCF) time-series pipelines ask for next:
missing days get the straight line between the surrounding observed
days. Implemented with the two-sided LOCF composition: per user,
generate the full day spine (sequence-explode between first and last
active day, map-side), carry (prev_day, prev_cents) forward and
(next_day, next_cents) backward with `last/first(..., ignorenulls)`
over mirrored frames, then one exact integer interpolation
  prev + (next − prev)·(d − d0) DIV (d1 − d0)
(floor semantics are safe: the numerator product sits in
[−|Δ|·gap, |Δ|·gap], and BOTH engines compute the identical
magnitude-then-sign form, the `orders_mom_growth` rule).

Per-day observed value = exact cents sum of that user's events.
Output bounded per user by their active span; endpoints carry
themselves (interp == observed where present).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2, epoch_us

_US_PER_DAY = 86_400_000_000

_GAPFILL_ORACLE = f"""
WITH d AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM d GROUP BY user_id
),
spine AS (
  SELECT s.user_id, s.d0 + g AS day
  FROM span s, UNNEST(range(0, s.d1 - s.d0 + 1)) AS t(g)
),
joined AS (
  SELECT sp.user_id, sp.day, d.cents
  FROM spine sp LEFT JOIN d ON d.user_id = sp.user_id AND d.day = sp.day
),
carried AS (
  SELECT user_id, day, cents,
         LAST_VALUE(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
           OVER wf AS prev_day,
         LAST_VALUE(cents IGNORE NULLS) OVER wf AS prev_cents,
         FIRST_VALUE(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
           OVER wb AS next_day,
         FIRST_VALUE(cents IGNORE NULLS) OVER wb AS next_cents
  FROM joined
  WINDOW wf AS (PARTITION BY user_id ORDER BY day
                ROWS UNBOUNDED PRECEDING),
         wb AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, CAST(day AS BIGINT) AS day,
       CAST(cents AS BIGINT) AS observed_cents,
       CAST(CASE
         WHEN cents IS NOT NULL THEN cents
         WHEN next_cents >= prev_cents THEN
           prev_cents + (next_cents - prev_cents) * (day - prev_day)
                        // (next_day - prev_day)
         ELSE
           prev_cents - (prev_cents - next_cents) * (day - prev_day)
                        // (next_day - prev_day)
       END AS BIGINT) AS filled_cents
FROM carried
"""


@register("events_gapfill_linear", _GAPFILL_ORACLE)
def events_gapfill_linear(spark, sf_dir):
    d = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            epoch_us(F.col("ts")).alias("us"),
            cents("value").alias("c"),
        )
        .groupBy("user_id", F.expr(f"us DIV {_US_PER_DAY}").alias("day"))
        .agg(F.sum("c").cast("bigint").alias("cents"))
    )
    span = d.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "user_id",
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
    )
    joined = spine.join(d, ["user_id", "day"], "left")
    wf = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("cents").isNotNull(), F.col("day"))
    carried = joined.select(
        "user_id",
        "day",
        "cents",
        F.last(obs_day, ignorenulls=True).over(wf).alias("prev_day"),
        F.last("cents", ignorenulls=True).over(wf).alias("prev_cents"),
        F.first(obs_day, ignorenulls=True).over(wb).alias("next_day"),
        F.first("cents", ignorenulls=True).over(wb).alias("next_cents"),
    )
    return carried.select(
        "user_id",
        F.col("day").cast("bigint").alias("day"),
        F.col("cents").cast("bigint").alias("observed_cents"),
        F.expr(
            "CAST(CASE"
            " WHEN cents IS NOT NULL THEN cents"
            " WHEN next_cents >= prev_cents THEN"
            "   prev_cents + (next_cents - prev_cents) * (day - prev_day)"
            "                DIV (next_day - prev_day)"
            " ELSE"
            "   prev_cents - (prev_cents - next_cents) * (day - prev_day)"
            "                DIV (next_day - prev_day)"
            " END AS BIGINT)"
        ).alias("filled_cents"),
    )
