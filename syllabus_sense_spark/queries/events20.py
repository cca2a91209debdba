"""Seasonality profile — hour-of-day load curve per event type, with
the peak hour flagged: the capacity-planning histogram behind
autoscaling schedules. Share is exact integer ppm of the type's own
total; the peak flag is a per-type window argmax with an hour
tiebreak.

One map-side-combined groupBy on (type, hour), then windows over the
|types|×24-row reduced table.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import epoch_us

_US_PER_HOUR = 3_600_000_000

_HOURLY_PROFILE_ORACLE = f"""
WITH h AS (
  SELECT event_type,
         CAST(epoch_us(ts) // {_US_PER_HOUR} % 24 AS INT) AS hour_of_day,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
t AS (
  SELECT event_type, hour_of_day, n,
         SUM(n) OVER (PARTITION BY event_type) AS total,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY n DESC, hour_of_day ASC
         ) AS rk
  FROM h
)
SELECT event_type, hour_of_day,
       CAST(n AS BIGINT) AS n,
       CAST(n * 1000000 // total AS BIGINT) AS share_ppm,
       CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS INT) AS is_peak
FROM t
"""


@register("events_hourly_profile", _HOURLY_PROFILE_ORACLE)
def events_hourly_profile(spark, sf_dir):
    h = (
        load(spark, sf_dir, "events")
        .select("event_type", epoch_us(F.col("ts")).alias("us"))
        .select(
            "event_type",
            F.expr(
                f"CAST(us DIV {_US_PER_HOUR} % 24 AS INT)"
            ).alias("hour_of_day"),
        )
        .groupBy("event_type", "hour_of_day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_tot = Window.partitionBy("event_type")
    w_rk = Window.partitionBy("event_type").orderBy(
        F.desc("n"), F.asc("hour_of_day")
    )
    t = h.select(
        "event_type",
        "hour_of_day",
        "n",
        F.sum("n").over(w_tot).alias("total"),
        F.row_number().over(w_rk).alias("rk"),
    )
    return t.select(
        "event_type",
        "hour_of_day",
        F.col("n").cast("bigint").alias("n"),
        F.expr("n * 1000000 DIV total").alias("share_ppm"),
        F.when(F.col("rk") == 1, 1).otherwise(0).cast("int").alias("is_peak"),
    )
