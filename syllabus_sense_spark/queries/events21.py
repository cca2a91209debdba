"""Attribution + calendar split batch.

`events_attribution_first_touch`: the FIRST-touch twin of
`events_attribution_last_touch` — every purchase credits the user's
first-ever channel event (acquisition attribution, vs the LOCF
last-touch's conversion attribution). First touch is a per-user
reduce (min (us, event_id) over channel events — no window needed),
broadcast back onto purchases; purchases BEFORE the first channel
event surface as '(none)'.

`events_weekend_split`: weekday-vs-weekend load per event type. Both
engines derive day-of-week from integer epoch days ((day + 3) % 7 in
Monday=0 encoding, 1970-01-01 being a Thursday, so weekend is
dow ∈ {5, 6} = Sat/Sun) — Spark's `dayofweek` (Sunday=1) and
DuckDB's `dayofweek` (Sunday=0) conventions differ, so neither
built-in appears in a checked output.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2, epoch_us

_US_PER_DAY = 86_400_000_000

_FIRST_TOUCH_ORACLE = """
WITH first_touch AS (
  SELECT user_id,
         MIN(lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
             || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS packed
  FROM events WHERE event_type <> 'purchase'
  GROUP BY user_id
),
ft AS (
  SELECT f.user_id,
         CAST(substr(f.packed, 1, 20) AS BIGINT) AS first_us,
         e.event_type AS channel
  FROM first_touch f
  JOIN events e
    ON e.user_id = f.user_id
   AND e.event_id = CAST(substr(f.packed, 21, 12) AS BIGINT)
),
purch AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
)
SELECT COALESCE(CASE WHEN p.us >= ft.first_us THEN ft.channel END,
                '(none)') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(p.cents) AS BIGINT) AS cents
FROM purch p LEFT JOIN ft ON ft.user_id = p.user_id
GROUP BY 1
"""


@register("events_attribution_first_touch", _FIRST_TOUCH_ORACLE)
def events_attribution_first_touch(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    ch = e.filter(F.col("event_type") != "purchase").select(
        "user_id",
        epoch_us(F.col("ts")).alias("us"),
        "event_id",
        "event_type",
    )
    # per-user argmin via a zero-padded string pack of (us, event_id)
    # — lexicographic MIN over fixed-width digits is the numeric
    # order, total (event_id unique), and never overflows the way a
    # us·10^8 + id integer pack would (us alone is ~1.7e15 µs)
    first_touch = ch.groupBy("user_id").agg(
        F.min(
            F.expr(
                "lpad(CAST(us AS STRING), 20, '0')"
                " || lpad(CAST(event_id AS STRING), 12, '0')"
            )
        ).alias("packed")
    )
    ft = first_touch.join(
        ch.select(F.col("user_id").alias("fu_user"), "event_id", "event_type"),
        (F.col("event_id") == F.expr("CAST(substr(packed, 21, 12) AS BIGINT)"))
        & (F.col("user_id") == F.col("fu_user")),
    ).select(
        "user_id",
        F.expr("CAST(substr(packed, 1, 20) AS BIGINT)").alias("first_us"),
        F.col("event_type").alias("channel"),
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        epoch_us(F.col("ts")).alias("us"),
        cents("value").alias("cents"),
    )
    return (
        purch.join(F.broadcast(ft), "user_id", "left")
        .groupBy(
            F.coalesce(
                F.when(F.col("us") >= F.col("first_us"), F.col("channel")),
                F.lit("(none)"),
            ).alias("channel")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )


_WEEKEND_ORACLE = f"""
WITH e AS (
  SELECT event_type,
         (epoch_us(ts) // {_US_PER_DAY} + 3) % 7 AS dow,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
)
SELECT event_type,
       CAST(CASE WHEN dow >= 5 THEN 1 ELSE 0 END AS INT) AS is_weekend,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM e GROUP BY 1, 2
"""


@register("events_weekend_split", _WEEKEND_ORACLE)
def events_weekend_split(spark, sf_dir):
    e = load(spark, sf_dir, "events").select(
        "event_type",
        epoch_us(F.col("ts")).alias("us"),
        cents("value").alias("cents"),
    )
    return (
        e.select(
            "event_type",
            F.expr(f"(us DIV {_US_PER_DAY} + 3) % 7").alias("dow"),
            "cents",
        )
        .groupBy(
            "event_type",
            F.expr("CAST(CASE WHEN dow >= 5 THEN 1 ELSE 0 END AS INT)").alias(
                "is_weekend"
            ),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )
