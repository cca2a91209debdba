"""Gaps-and-islands — longest consecutive-day activity streak per
user, the classic SQL islands pattern (day − dense row index is
constant within an island) and the engagement metric behind every
"streak" feature.

Pure integer arithmetic on epoch-day numbers: the distinct
(user, day) presence table reduces the stream once; the island key
``day − row_number`` needs one window per user partition; islands
then aggregate map-side. Output per user: active days, island count,
longest and current-relative-to-max-day streak lengths — all exact.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import epoch_us

_US_PER_DAY = 86_400_000_000

_STREAKS_ORACLE = f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_US_PER_DAY} AS day
  FROM events
),
keyed AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
           AS island
  FROM ud
),
islands AS (
  SELECT user_id, island, COUNT(*) AS len, MAX(day) AS island_end
  FROM keyed GROUP BY user_id, island
)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(MAX(CASE WHEN island_end = (SELECT MAX(day) FROM ud)
                     THEN len ELSE 0 END) AS BIGINT) AS ending_streak
FROM islands GROUP BY user_id
"""


@register("events_user_streaks", _STREAKS_ORACLE)
def events_user_streaks(spark, sf_dir):
    ud = (
        load(spark, sf_dir, "events")
        .select("user_id", epoch_us(F.col("ts")).alias("us"))
        .select("user_id", F.expr(f"us DIV {_US_PER_DAY}").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    keyed = ud.select(
        "user_id", "day", (F.col("day") - F.row_number().over(w)).alias("island")
    )
    islands = keyed.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"), F.max("day").alias("island_end")
    )
    last_day = ud.agg(F.max("day").alias("max_day"))
    return (
        islands.join(F.broadcast(last_day))
        .groupBy("user_id")
        .agg(
            F.sum("len").cast("bigint").alias("n_active_days"),
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.max("len").cast("bigint").alias("longest_streak"),
            F.max(
                F.when(F.col("island_end") == F.col("max_day"), F.col("len"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("ending_streak"),
        )
    )
