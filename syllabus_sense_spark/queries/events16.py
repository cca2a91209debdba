"""Burst (bot/abuse) detection — per-user peak request rate over
1-minute buckets and adjacent-bucket pairs, the screening heuristic
rate-limiters and crawler filters run upstream of every serving and
training pipeline.

The exact "max events in ANY 60-second sliding window" needs a
per-user sort; the bucketed form (max single minute, max two ADJACENT
minutes — adjacency checked via lag over the minute index, so empty
minutes break the pair) brackets it: max_minute ≤ true-peak ≤
max_burst2, deterministic and exact-integer at any scale. Events
reduce map-side to (user, minute) counts first; the windows run on
that reduced table, partitioned by user.

Output per user: bucket peak, adjacent-pair peak, and the flag at
threshold ≥ 10/2-minutes (calibrated to the synthetic stream's
heaviest users rather than production traffic — the shape, not the
constant, is the operator).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import epoch_us

_US_PER_MIN = 60_000_000
_THRESH = 10

_BURST_ORACLE = f"""
WITH m AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_MIN} AS minute,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
p AS (
  SELECT user_id, cnt,
         cnt + CASE WHEN LAG(minute) OVER w = minute - 1
                    THEN LAG(cnt) OVER w ELSE 0 END AS burst2
  FROM m WINDOW w AS (PARTITION BY user_id ORDER BY minute)
)
SELECT user_id,
       CAST(MAX(cnt) AS BIGINT) AS max_minute_events,
       CAST(MAX(burst2) AS BIGINT) AS max_burst2,
       CAST(CASE WHEN MAX(burst2) >= {_THRESH} THEN 1 ELSE 0 END AS INT)
         AS is_burst
FROM p GROUP BY user_id
"""


@register("events_burst_detection", _BURST_ORACLE)
def events_burst_detection(spark, sf_dir):
    m = (
        load(spark, sf_dir, "events")
        .select("user_id", epoch_us(F.col("ts")).alias("us"))
        .select("user_id", F.expr(f"us DIV {_US_PER_MIN}").alias("minute"))
        .groupBy("user_id", "minute")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("user_id").orderBy("minute")
    p = m.select(
        "user_id",
        "cnt",
        (
            F.col("cnt")
            + F.when(
                F.lag("minute").over(w) == F.col("minute") - 1,
                F.lag("cnt").over(w),
            ).otherwise(0)
        ).alias("burst2"),
    )
    return p.groupBy("user_id").agg(
        F.max("cnt").cast("bigint").alias("max_minute_events"),
        F.max("burst2").cast("bigint").alias("max_burst2"),
        F.when(F.max("burst2") >= _THRESH, 1)
        .otherwise(0)
        .cast("int")
        .alias("is_burst"),
    )
