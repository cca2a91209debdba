"""Native `session_window` batch sessionization — certifying Spark's
built-in session operator against the hand-rolled gap-cumsum form.

`events_sessionize_gap30m` builds sessions the portable way (LAG +
running sum of gap breaks); Spark also ships a NATIVE session
operator (`F.session_window`) whose merge semantics — an event joins
a session while `event_time < last_event + gap`, i.e. a gap of
exactly 30 min starts a NEW session, and the session's `end` is
`last_event + gap`, not `last_event` — differ subtly from naive
expectations. This query runs the native operator and the DuckDB
oracle replays the exact contract with the cumsum construction
(break on `diff ≥ gap`, end = max + gap), so a hash match pins the
built-in's semantics, not just ours.

Scale posture: identical to the cumsum form — one shuffle on
user_id; the native operator merges sessions inside the partition
(and is the same operator Structured Streaming uses for session
state, so batch and stream agree by construction).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import epoch_us

_GAP_US = 30 * 60 * 1_000_000

_NATIVE_SESSION_ORACLE = f"""
WITH o AS (
  SELECT user_id, epoch_us(ts) AS us FROM events
),
g AS (
  SELECT user_id, us,
         CASE WHEN LAG(us) OVER w IS NULL
                   OR us - LAG(us) OVER w >= {_GAP_US}
              THEN 1 ELSE 0 END AS brk
  FROM o
  WINDOW w AS (PARTITION BY user_id ORDER BY us)
),
s AS (
  SELECT user_id, us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id,
       CAST(MIN(us) AS BIGINT) AS session_start_us,
       CAST(MAX(us) + {_GAP_US} AS BIGINT) AS session_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sid
"""


@register("events_sessionize_native", _NATIVE_SESSION_ORACLE)
def events_sessionize_native(spark, sf_dir):
    e = load(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("t")
    )
    return (
        e.groupBy("user_id", F.session_window("t", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            epoch_us(F.col("session_window.start")).alias("session_start_us"),
            epoch_us(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
        )
    )
