"""Events batch 24: DYNAMIC-gap session windows — the per-event
timeout form of sessionization (a purchase keeps the session alive
for 60 minutes, anything else 30), the semantics
``F.session_window(ts, gap_expr)`` implements by interval merging.

The oracle replays the merge relationally: an event opens a new
session iff its timestamp is at or past the RUNNING MAX of previous
events' (ts + their own gap) — windows are [ts, ts+gap) with an
exclusive end, so touching intervals do NOT merge (>=, not >). That
running max (cummax over the preceding frame) is the exact batch
spelling of the engine's interval-union; the hash match pins the
boundary semantics, the per-event gap attribution, and the
session_end = max(ts_i + gap_i) definition.

Scale: one shuffle on user_id, per-row O(1) window state — identical
posture to the fixed-gap twin (events_session_window_native); in
streaming this is the state-store session operator with per-event
timeouts.

Reference anchor: generalizes A5's sessionized grouping
(operators/sessionize.py; reference
document_parser/syllabus_parser.py:118-154) to per-element timeouts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2, xsum

_GAP_US_SQL = (
    "CASE WHEN event_type = 'purchase' THEN 3600000000 ELSE 1800000000 END"
)

_DYN_SESSION_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_id, ts, event_type, value,
         epoch_us(ts) AS ts_us,
         {_GAP_US_SQL} AS gap_us
  FROM events
),
flagged AS (
  SELECT *,
    CASE WHEN MAX(ts_us + gap_us) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
           OR ts_us >= MAX(ts_us + gap_us) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS new_session
  FROM ev
),
numbered AS (
  SELECT *, SUM(new_session) OVER (
              PARTITION BY user_id ORDER BY ts_us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       make_timestamp(MAX(ts_us + gap_us)) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchases,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM numbered
GROUP BY user_id, sid
"""


@register("events_sessionize_dynamic_gap", _DYN_SESSION_ORACLE)
def events_sessionize_dynamic_gap(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    gap = F.expr(
        "CASE WHEN event_type = 'purchase' THEN '60 minutes'"
        " ELSE '30 minutes' END"
    )
    return (
        e.groupBy(
            F.session_window(F.col("ts").cast("timestamp"), gap), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("n_purchases"),
            xsum(cents("value"), 2, 18).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "n_purchases",
            "session_value",
        )
    )
