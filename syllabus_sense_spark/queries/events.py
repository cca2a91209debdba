"""Event-time operators over the ``events`` stream table (batch form;
the Structured Streaming variants live in ``streaming/``).

- tumbling window aggregation (``F.window`` ≡ date_trunc bucketing),
- gap-based sessionization (the batch equivalent of
  ``F.session_window`` — lag + cumulative flag, exactly the pattern of
  the reference's topic sessionizer A5 applied to time),
- as-of join (point-in-time enrichment) via the union+LOCF operator.

Timestamps are compared in exact integer microseconds
(``unix_micros`` / ``epoch_us``) so Spark and the DuckDB oracle agree
bit-for-bit on boundary events.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..tables import load
from . import register
from ._util import cents, dec2, epoch_us, xsum

_TUMBLING_ORACLE = """
SELECT
  date_trunc('hour', ts) AS window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register("events_tumbling_hourly", _TUMBLING_ORACLE)
def events_tumbling_hourly(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    # F.window(ts, "1 hour").start == date_trunc('hour', ts) for
    # aligned tumbling windows; date_trunc keeps the output scalar so
    # the oracle can hash it. The streaming variant uses F.window.
    return e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        xsum(cents("value"), 2, 18).alias("total_value"),
    )


_SESSION_ORACLE = """
WITH flagged AS (
  SELECT
    user_id,
    ts,
    value,
    CASE WHEN LAG(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT
    user_id,
    ts,
    value,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS session_id
  FROM flagged
)
SELECT
  user_id,
  CAST(session_id AS BIGINT) AS session_id,
  COUNT(*) AS n_events,
  MIN(ts) AS session_start,
  MAX(ts) AS session_end,
  CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM sessions
GROUP BY user_id, session_id
"""


@register("events_sessionize_gap30m", _SESSION_ORACLE)
def events_sessionize_gap30m(spark, sf_dir):
    # Gap-based sessionization: one shuffle on user_id; the running sum
    # never crosses users, so this scales to any number of users.
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
    return sessions.groupBy(
        "user_id", F.col("session_id").cast("long").alias("session_id")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (epoch_us(F.max("ts")) - epoch_us(F.min("ts")))
        .cast("long")
        .alias("duration_us"),
        xsum(cents("value"), 2, 18).alias("session_value"),
    )


_ASOF_ORACLE = """
SELECT
  e.event_id,
  e.user_id,
  e.ts,
  o.o_orderkey AS last_orderkey,
  o.o_orderdate AS last_orderdate
FROM events e
LEFT JOIN LATERAL (
  SELECT o_orderkey, o_orderdate
  FROM orders
  WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
  ORDER BY o_orderdate DESC, o_orderkey DESC
  LIMIT 1
) o ON TRUE
WHERE e.event_type = 'purchase'
"""


@register("events_asof_last_order", _ASOF_ORACLE)
def events_asof_last_order(spark, sf_dir):
    # As-of join: each purchase event picks up the user's most recent
    # order at event time (ties broken by highest orderkey). Implemented
    # as union + LOCF window — a single shuffle on the key, no
    # nested-loop range join (see operators/asof.py).
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderkey"),
        F.col("o_orderdate"),
    )
    joined = asof_join(
        e,
        o,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        value_cols=["o_orderkey", "o_orderdate"],
        how="left",
        tiebreak="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_orderdate").alias("last_orderdate"),
    )


_ASOF_INNER_ORACLE = """
SELECT
  e.event_id,
  e.user_id,
  e.ts,
  o.o_orderkey AS last_orderkey,
  o.o_orderdate AS last_orderdate
FROM events e
JOIN LATERAL (
  SELECT o_orderkey, o_orderdate
  FROM orders
  WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
  ORDER BY o_orderdate DESC, o_orderkey DESC
  LIMIT 1
) o ON TRUE
WHERE e.event_type = 'purchase'
"""


@register("events_asof_inner", _ASOF_INNER_ORACLE)
def events_asof_inner(spark, sf_dir):
    # Inner-mode as-of: purchases with no prior order are dropped
    # (operators/asof.py how='inner' path — the post-window filter on
    # the carried value struct). Same single-shuffle plan as the left
    # variant.
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderkey"),
        F.col("o_orderdate"),
    )
    joined = asof_join(
        e,
        o,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        value_cols=["o_orderkey", "o_orderdate"],
        how="inner",
        tiebreak="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_orderdate").alias("last_orderdate"),
    )


_ASOF_FORWARD_ORACLE = """
SELECT
  e.event_id,
  e.user_id,
  e.ts,
  o.o_orderkey AS next_orderkey,
  o.o_orderdate AS next_orderdate
FROM events e
LEFT JOIN LATERAL (
  SELECT o_orderkey, o_orderdate
  FROM orders
  WHERE o_custkey = e.user_id AND o_orderdate >= e.ts
  ORDER BY o_orderdate ASC, o_orderkey DESC
  LIMIT 1
) o ON TRUE
WHERE e.event_type = 'purchase'
"""


@register("events_asof_next_order", _ASOF_FORWARD_ORACLE)
def events_asof_next_order(spark, sf_dir):
    # Forward-mode as-of (merge_asof direction='forward'): each
    # purchase event picks up the user's EARLIEST order at or after
    # event time — the conversion-attribution lookup. Same
    # single-shuffle union+window plan as backward, over reversed
    # time order (operators/asof.py direction='forward').
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderkey"),
        F.col("o_orderdate"),
    )
    joined = asof_join(
        e,
        o,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        value_cols=["o_orderkey", "o_orderdate"],
        how="left",
        tiebreak="o_orderkey",
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderkey").alias("next_orderkey"),
        F.col("o_orderdate").alias("next_orderdate"),
    )


_ASOF_NEAREST_ORACLE = """
SELECT
  e.event_id,
  e.user_id,
  e.ts,
  o.o_orderkey AS nearest_orderkey,
  o.o_orderdate AS nearest_orderdate
FROM events e
LEFT JOIN LATERAL (
  SELECT o_orderkey, o_orderdate
  FROM orders
  WHERE o_custkey = e.user_id
  ORDER BY abs(epoch_us(e.ts) - epoch_us(CAST(o_orderdate AS TIMESTAMP))),
           CASE WHEN o_orderdate <= e.ts THEN 0 ELSE 1 END,
           o_orderkey DESC
  LIMIT 1
) o ON TRUE
WHERE e.event_type = 'purchase'
"""


@register("events_asof_nearest_order", _ASOF_NEAREST_ORACLE)
def events_asof_nearest_order(spark, sf_dir):
    # Nearest-mode as-of (merge_asof direction='nearest'): the closer
    # of the backward and forward candidates, exact distance ties
    # preferring backward. Still ONE shuffle: both window passes share
    # the hash exchange (same partition keys, two sort orders) —
    # never a range join (operators/asof.py direction='nearest').
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderkey"),
        F.col("o_orderdate"),
    )
    joined = asof_join(
        e,
        o,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        value_cols=["o_orderkey", "o_orderdate"],
        how="left",
        tiebreak="o_orderkey",
        direction="nearest",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderkey").alias("nearest_orderkey"),
        F.col("o_orderdate").alias("nearest_orderdate"),
    )
