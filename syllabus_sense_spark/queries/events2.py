"""Event-time coverage, batch 2: sliding (hopping) windows via
``F.window`` row expansion, native ``F.session_window``, and a
two-level rollup that re-aggregates hourly partials into daily — the
continuous-aggregate / hypertable-rollup pattern.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2, xsum, xsum_total

# --- sliding windows: 1h length, 15min hop --------------------------------
# Spark's F.window with a slide expands each event into 4 rows (one per
# covering window); the oracle reproduces that with an explicit
# 4-offset expansion off time_bucket (both are epoch-aligned).

_SLIDING_ORACLE = """
SELECT
  time_bucket(INTERVAL '15 minutes', ts) - CAST(unnest([0,1,2,3]) * 15 AS BIGINT) * INTERVAL 1 MINUTE
    AS window_start,
  event_id
FROM events
WHERE event_id % 250 = 0
"""


@register("events_sliding_windows", _SLIDING_ORACLE)
def events_sliding_windows(spark, sf_dir):
    e = load(spark, sf_dir, "events").filter(F.col("event_id") % 250 == 0)
    return e.select(
        F.window("ts", "1 hour", "15 minutes").start.alias("window_start"),
        "event_id",
    )


_SLIDING_AGG_ORACLE = """
WITH expanded AS (
  SELECT
    time_bucket(INTERVAL '15 minutes', ts)
      - CAST(unnest([0,1,2,3]) * 15 AS BIGINT) * INTERVAL 1 MINUTE AS window_start,
    event_type,
    value
  FROM events
)
SELECT
  window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM expanded
GROUP BY window_start, event_type
"""


@register("events_sliding_window_agg", _SLIDING_AGG_ORACLE)
def events_sliding_window_agg(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return e.groupBy(
        F.window("ts", "1 hour", "15 minutes").start.alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        xsum(cents("value"), 2, 18).alias("total_value"),
    )


# --- native session windows ------------------------------------------------
# F.session_window(gap) in batch mode: window.start = first event,
# window.end = last event + gap. The oracle reuses the lag+cumsum
# construction (the two formulations must agree exactly).

_SESSION_NATIVE_ORACLE = """
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
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS session_id
  FROM flagged
)
SELECT
  user_id,
  MIN(ts) AS session_start,
  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM sessions
GROUP BY user_id, session_id
"""


@register("events_session_window_native", _SESSION_NATIVE_ORACLE)
def events_session_window_native(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            xsum(cents("value"), 2, 18).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


# --- hierarchical rollup: daily from hourly partials ----------------------
# The hypertable/continuous-aggregate pattern: the daily aggregate is
# computed FROM the hourly aggregate (partial re-aggregation), not
# from raw events — at 100 TB this is the difference between scanning
# 24x less data for every coarser resolution.

_ROLLUP2_ORACLE = """
WITH hourly AS (
  SELECT
    date_trunc('hour', ts) AS hour_start,
    event_type,
    COUNT(*) AS n_events,
    SUM(CAST(value AS DECIMAL(18,2))) AS total_value
  FROM events
  GROUP BY 1, 2
)
SELECT
  CAST(date_trunc('day', hour_start) AS TIMESTAMP) AS day_start,
  event_type,
  CAST(SUM(n_events) AS BIGINT) AS n_events,
  CAST(SUM(total_value) AS DOUBLE) AS total_value,
  COUNT(*) AS n_active_hours
FROM hourly
GROUP BY 1, 2
"""


@register("events_rollup_daily_from_hourly", _ROLLUP2_ORACLE)
def events_rollup_daily_from_hourly(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        # exact per-hour total in cents (scaled long) — the daily
        # re-aggregation re-splits it, staying in long sums end to end
        xsum_total(cents("value")).cast("long").alias("total_cents"),
    )
    return hourly.groupBy(
        F.date_trunc("day", F.col("hour_start")).alias("day_start"),
        "event_type",
    ).agg(
        F.sum("n_events").alias("n_events"),
        # sum over hourly decimal(28,2) partials typed (38,2) — the
        # reconstruction matches it via prec=28
        xsum(F.col("total_cents"), 2, 28).alias("total_value"),
        F.count(F.lit(1)).alias("n_active_hours"),
    )


# --- CDC-style dedup: keep the latest record per key ----------------------
# The compaction every change-capture / upsert ingest runs: one window
# shuffle on the key, rank by (event time desc, id desc) for a total
# order, keep rank 1. At scale this is the "latest snapshot" view of
# an append-only log.

_LATEST_ORACLE = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
       ts AS last_ts
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


@register("events_latest_per_key", _LATEST_ORACLE)
def events_latest_per_key(spark, sf_dir):
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("ts").alias("last_ts"),
        )
    )
