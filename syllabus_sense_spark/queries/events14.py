"""Last-touch attribution — every purchase event's value is credited
to the last NON-purchase event ("channel": view / click / signup /
error) the same user generated at or before purchase time. The
business-side consumer of the as-of machinery (`operators/asof.py`):
same union+LOCF single-shuffle shape as `events_asof_last_order`,
with the reference side filtered to the channel events.

Revenue is exact DECIMAL cents; purchases that precede the user's
first channel event credit '(none)' — the attribution gap every real
report has to surface rather than drop.

Scale posture: ONE shuffle on user_id (the union window), then a
map-side-combined groupBy over |channels| keys. No range join, no
per-purchase scan of the event history.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..tables import load
from . import register
from ._util import cents, dec2, epoch_us

_ATTRIBUTION_ORACLE = """
WITH probe AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, event_type
  FROM events WHERE event_type <> 'purchase'
),
u AS (
  SELECT user_id, us, 1 AS is_probe, CAST(NULL AS VARCHAR) AS etype,
         CAST(NULL AS BIGINT) AS eid, cents
  FROM probe
  UNION ALL
  SELECT user_id, us, 0, event_type, event_id, NULL FROM ev
),
locf AS (
  SELECT is_probe, cents,
         LAST_VALUE(etype IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, is_probe, eid
           ROWS UNBOUNDED PRECEDING
         ) AS channel
  FROM u
)
SELECT COALESCE(channel, '(none)') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM locf WHERE is_probe = 1
GROUP BY 1
"""


@register("events_attribution_last_touch", _ATTRIBUTION_ORACLE)
def events_attribution_last_touch(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    probe = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        epoch_us(F.col("ts")).alias("us"),
        cents("value").alias("cents"),
    )
    channels = e.filter(F.col("event_type") != "purchase").select(
        "user_id",
        epoch_us(F.col("ts")).alias("us"),
        "event_id",
        "event_type",
    )
    joined = asof_join(
        probe,
        channels,
        on="user_id",
        left_time="us",
        right_time="us",
        value_cols=["event_type"],
        how="left",
        tiebreak="event_id",
    )
    return joined.groupBy(
        F.coalesce(F.col("event_type"), F.lit("(none)")).alias("channel")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.sum("cents").cast("bigint").alias("cents"),
    )
