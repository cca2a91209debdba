"""Event analytics batch 5: time-bound conversion — for each view
event, did the same user purchase within the following 7 days?

The shape is the time-window variant of the sequential funnel
(events3.py): instead of "ever after", the conversion must land inside
``(view_ts, view_ts + 7 days]``. Implemented as a left-semi join on
``user_id`` with the range predicate evaluated after the equi match —
one shuffle of each side on the natural key, no nested-loop join; the
per-day rollup that follows is a tiny aggregate. At 100 TB both inputs
hash-partition on user_id and the semi join streams per key; skewed
power-users are bounded by AQE skew splitting.

Determinism: counts are exact integers; the rate is one IEEE double
division of identical integers in both engines. Interval arithmetic
(`ts + INTERVAL 7 DAYS`) is exact microsecond math in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_CONV_ORACLE = """
WITH v AS (
  SELECT event_id, user_id, ts, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events WHERE event_type = 'view'
),
converted AS (
  SELECT v.event_id, v.day
  FROM v
  WHERE EXISTS (
    SELECT 1 FROM events p
    WHERE p.event_type = 'purchase'
      AND p.user_id = v.user_id
      AND p.ts > v.ts
      AND p.ts <= v.ts + INTERVAL 7 DAY
  )
),
views_per_day AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_views FROM v GROUP BY day
),
conv_per_day AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_conversions
  FROM converted GROUP BY day
)
SELECT
  vd.day,
  vd.n_views,
  COALESCE(cd.n_conversions, 0) AS n_conversions,
  CAST(COALESCE(cd.n_conversions, 0) AS DOUBLE) / vd.n_views
    AS conversion_rate
FROM views_per_day vd
LEFT JOIN conv_per_day cd ON cd.day = vd.day
"""


@register("events_conversion_within_7d", _CONV_ORACLE)
def events_conversion_within_7d(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        "event_id",
        "user_id",
        "ts",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts")
    )
    converted = v.join(
        p,
        (F.col("p_user_id") == F.col("user_id"))
        & (F.col("p_ts") > F.col("ts"))
        & (F.col("p_ts") <= F.col("ts") + F.expr("INTERVAL 7 DAYS")),
        "left_semi",
    )
    views_per_day = v.groupBy("day").agg(F.count(F.lit(1)).alias("n_views"))
    conv_per_day = converted.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_conversions")
    )
    return (
        views_per_day.join(conv_per_day, "day", "left")
        .withColumn("n_conversions", F.coalesce("n_conversions", F.lit(0)))
        .select(
            "day",
            "n_views",
            "n_conversions",
            (F.col("n_conversions").cast("double") / F.col("n_views")).alias(
                "conversion_rate"
            ),
        )
    )


