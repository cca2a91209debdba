"""Time-series feature engineering — the lag/rolling feature matrix
a forecasting or churn model trains on.

Per (user, day): the day's exact value mass, yesterday's
(gap-aware), and the trailing-7-day window — with RANGE frames over
the integer day number, so CALENDAR gaps are handled exactly: a
missing yesterday yields NULL (not "previous row"), and the 7-day
window covers days d−6…d regardless of how many of them traded.
ROWS frames — the common bug — would silently compact gaps.

Exactness: day = ⌊epoch_us/86.4e9⌋ (integer); values aggregate as
DECIMAL(18,2) and are emitted as single-cast doubles; the rolling
window emits sum and count separately rather than a divided average
(the consumer divides; the check stays division-free).

Scale posture: one shuffle on user_id; both window frames run inside
the user partition ordered by day (spill-safe local sort); the daily
pre-aggregation is map-side combined before the shuffle. The same
shape as the gap-fill/forward-fill query (events4), which feeds this
one in a real feature pipeline.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import dec2, epoch_us

_US_PER_DAY = 86_400_000_000

_LAG_FEATURES_ORACLE = f"""
WITH daily AS (
  SELECT user_id,
         CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         SUM(CAST(value AS DECIMAL(18,2))) AS v
  FROM events GROUP BY 1, 2
)
SELECT user_id, day,
       CAST(v AS DOUBLE) AS day_value,
       CAST(SUM(v) OVER (
         PARTITION BY user_id ORDER BY day
         RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING
       ) AS DOUBLE) AS lag_1d,
       CAST(SUM(v) OVER (
         PARTITION BY user_id ORDER BY day
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS ma7_sum,
       CAST(COUNT(*) OVER (
         PARTITION BY user_id ORDER BY day
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS ma7_n
FROM daily
"""


@register("events_lag_features", _LAG_FEATURES_ORACLE)
def events_lag_features(spark, sf_dir):
    daily = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            epoch_us(F.col("ts")).alias("us"),
            dec2("value").alias("v"),
        )
        # integer DIV, not `/`: float division + truncation can flip
        # day boundaries vs the oracle's integer floor division
        .select(
            "user_id",
            F.expr(f"us DIV {_US_PER_DAY}").cast("bigint").alias("day"),
            "v",
        )
        .groupBy("user_id", "day")
        .agg(F.sum("v").alias("v"))
    )
    w1 = (
        Window.partitionBy("user_id").orderBy("day").rangeBetween(-1, -1)
    )
    w7 = (
        Window.partitionBy("user_id").orderBy("day").rangeBetween(-6, 0)
    )
    return daily.select(
        "user_id",
        "day",
        F.col("v").cast("double").alias("day_value"),
        F.sum("v").over(w1).cast("double").alias("lag_1d"),
        F.sum("v").over(w7).cast("double").alias("ma7_sum"),
        F.count(F.lit(1)).over(w7).cast("bigint").alias("ma7_n"),
    )
