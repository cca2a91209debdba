"""Event-analytics batch 3: the three classic product-analytics
shapes beyond plain sessionization — capped sessions, cohort
retention, and a sequential funnel.

All three shuffle only on ``user_id`` (the natural analytics key) and
everything after the first exchange stays co-partitioned, so the
shapes hold at any event volume; no window ever spans more than one
user.

Reference anchor: sessionization generalizes the reference's
topic-marker grouping (syllabus_parser.py:118-154); retention/funnel
are the events-table counterparts of its per-topic progress counts
(syllabus_ai_graph.py:82-84,136-138).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2, epoch_us, xsum

# --------------------------------------------------------------------------
# Capped sessions: 30-minute-gap sessions chunked into ≤1h windows
# anchored at the session start (the bounded-session variant used when
# downstream state must be capped). Chunking is a pure expression over
# the session-start window — no extra shuffle beyond the user_id one.
# --------------------------------------------------------------------------

_CAPPED_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS session_id
  FROM flagged
),
anchored AS (
  SELECT user_id, ts, value, session_id,
         MIN(ts) OVER (PARTITION BY user_id, session_id) AS session_start
  FROM sessions
)
SELECT user_id,
       CAST(session_id AS BIGINT) AS session_id,
       CAST((epoch_us(ts) - epoch_us(session_start)) // 3600000000 AS BIGINT)
         AS chunk_id,
       COUNT(*) AS n_events,
       MIN(ts) AS chunk_start,
       MAX(ts) AS chunk_end,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS chunk_value
FROM anchored
GROUP BY user_id, session_id, chunk_id
"""


@register("events_session_capped", _CAPPED_ORACLE)
def events_session_capped(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_us = epoch_us(F.lag("ts").over(w))
    flagged = e.select(
        "user_id",
        "ts",
        "value",
        F.when(
            prev_us.isNull() | ((epoch_us("ts") - prev_us) > 1_800_000_000),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(frame))
    anchored = sessions.withColumn(
        "session_start",
        F.min("ts").over(Window.partitionBy("user_id", "session_id")),
    )
    chunk = (
        (epoch_us("ts") - epoch_us("session_start"))
        / 3_600_000_000
    ).cast("bigint")
    return (
        anchored.withColumn("chunk_id", chunk)
        .groupBy(
            "user_id",
            F.col("session_id").cast("long").alias("session_id"),
            "chunk_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("chunk_start"),
            F.max("ts").alias("chunk_end"),
            xsum(cents("value"), 2, 18).alias("chunk_value"),
        )
    )


# --------------------------------------------------------------------------
# Cohort retention: users grouped by first-seen day, activity counted
# by day offset. Two co-partitioned shuffles on user_id (cohort agg +
# join back), then a small (cohort_day × offset) rollup.
# --------------------------------------------------------------------------

_COHORT_ORACLE = """
WITH cohorts AS (
  SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS cohort_day
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT e.user_id, date_trunc('day', e.ts) AS active_day
  FROM events e
)
SELECT c.cohort_day,
       CAST(date_diff('day', c.cohort_day, a.active_day) AS BIGINT) AS offset_days,
       CAST(COUNT(*) AS BIGINT) AS n_active_users
FROM active a
JOIN cohorts c ON c.user_id = a.user_id
GROUP BY c.cohort_day, offset_days
"""


@register("events_cohort_retention", _COHORT_ORACLE)
def events_cohort_retention(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    cohorts = e.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("cohort_day")
    )
    active = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("active_day")
    ).distinct()
    return (
        active.join(cohorts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("active_day"), F.col("cohort_day"))
            .cast("bigint")
            .alias("offset_days"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active_users"))
    )


# --------------------------------------------------------------------------
# Sequential funnel signup → view → purchase: each stage's timestamp
# must strictly follow the previous stage's. Three aggregations, all
# keyed on user_id — the joins between stages are co-partitioned with
# the aggregations, so the funnel costs one logical shuffle of the
# events plus per-user reductions.
# --------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'view' AND e.ts > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT 'signup' AS stage, (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_users
UNION ALL
SELECT 'signup>view', (SELECT CAST(COUNT(*) AS BIGINT) FROM s2)
UNION ALL
SELECT 'signup>view>purchase', (SELECT CAST(COUNT(*) AS BIGINT) FROM s3)
"""


@register("events_funnel_sequential", _FUNNEL_ORACLE)
def events_funnel_sequential(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        s1.agg(F.count(F.lit(1)).alias("c1"))
        .crossJoin(F.broadcast(s2.agg(F.count(F.lit(1)).alias("c2"))))
        .crossJoin(F.broadcast(s3.agg(F.count(F.lit(1)).alias("c3"))))
    )
    return counts.selectExpr(
        "stack(3, 'signup', c1, 'signup>view', c2, 'signup>view>purchase', c3) "
        "as (stage, n_users)"
    ).select("stage", F.col("n_users").cast("bigint").alias("n_users"))
