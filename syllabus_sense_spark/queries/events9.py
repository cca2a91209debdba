"""[EXT] Cohort retention — the product-analytics matrix (users who
first appeared on day D, still active k days later), day granularity.

Two aggregations over one scan shape: first-touch per user (min ts →
cohort day), distinct active (user, day) pairs, then a user_id
equi-join and a (cohort_day, day_offset) count. All keys are
user_id or tiny composites — at 100 TB the first-touch table is one
row per user (≪ events) and broadcastable for most tenants; the
distinct is the only real shuffle and it partitions on user_id, the
same partitioning the join then reuses.

Dates stay DATE and offsets integer (date_diff is exact calendar
arithmetic, identical in both engines); counts BIGINT. No floats.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_RETENTION_ORACLE = """
WITH firsts AS (
  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events
)
SELECT f.cohort_day,
       date_diff('day', f.cohort_day, a.day) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM active a JOIN firsts f USING (user_id)
GROUP BY 1, 2
"""


@register("events_retention_cohorts", _RETENTION_ORACLE)
def events_retention_cohorts(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    active = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    return (
        active.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
