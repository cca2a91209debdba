"""Local-peak detection over the daily event series — the "what
spiked?" report. A day is a peak when its count strictly exceeds the
two row-neighbors on each side (lag/lead with default 0, so series
edges can still peak); prominence is the margin over the tallest
neighbor. Pure integer comparisons over the pre-reduced daily table —
the window is partitioned by event_type, never global.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import epoch_us

_US_PER_DAY = 86_400_000_000

_PEAKS_ORACLE = f"""
WITH daily AS (
  SELECT event_type, epoch_us(ts) // {_US_PER_DAY} AS day, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
n AS (
  SELECT event_type, day, cnt,
         lag(cnt, 1, 0)  OVER w AS b1,
         lag(cnt, 2, 0)  OVER w AS b2,
         lead(cnt, 1, 0) OVER w AS a1,
         lead(cnt, 2, 0) OVER w AS a2
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day ASC)
)
SELECT event_type, CAST(day AS BIGINT) AS day, CAST(cnt AS BIGINT) AS cnt,
       CAST(cnt - GREATEST(b1, b2, a1, a2) AS BIGINT) AS prominence
FROM n
WHERE cnt > b1 AND cnt > b2 AND cnt > a1 AND cnt > a2
"""


@register("events_daily_peaks", _PEAKS_ORACLE)
def events_daily_peaks(spark, sf_dir):
    daily = (
        load(spark, sf_dir, "events")
        .select("event_type", epoch_us(F.col("ts")).alias("us"))
        .select("event_type", F.expr(f"us DIV {_US_PER_DAY}").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("event_type").orderBy(F.asc("day"))
    n = daily.select(
        "event_type",
        "day",
        "cnt",
        F.lag("cnt", 1, 0).over(w).alias("b1"),
        F.lag("cnt", 2, 0).over(w).alias("b2"),
        F.lead("cnt", 1, 0).over(w).alias("a1"),
        F.lead("cnt", 2, 0).over(w).alias("a2"),
    )
    return n.filter(
        (F.col("cnt") > F.col("b1"))
        & (F.col("cnt") > F.col("b2"))
        & (F.col("cnt") > F.col("a1"))
        & (F.col("cnt") > F.col("a2"))
    ).select(
        "event_type",
        F.col("day").cast("bigint").alias("day"),
        F.col("cnt").cast("bigint").alias("cnt"),
        (F.col("cnt") - F.greatest("b1", "b2", "a1", "a2"))
        .cast("bigint")
        .alias("prominence"),
    )
