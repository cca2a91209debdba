"""Event-analytics batch 4: interval (stream-stream-shaped) join,
time-series gap fill with forward fill, and a data-dependent value
histogram.

Scale posture:

- the interval join is an **equi-join on user_id with a range
  residual** — sort-merge co-partitioned on the analytics key, never
  a nested-loop over time (the batch twin of the Structured Streaming
  stream-stream interval join in ``streaming/joins.py``);
- gap fill builds its day spine *per user* with ``sequence`` +
  ``explode`` (spine size ∝ active span, not global calendar ×
  users) and forward-fills with the run-group trick — two window
  passes over the same user_id partitioning, no self-join;
- the histogram is one scalar aggregate broadcast back over one
  scan — the two-pass shape that works at any volume.

Reference anchor: the reference keeps per-topic progress counters
(syllabus_ai_graph.py:82-84,136-138); these are the engine-grade
counterparts over the events stream.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2, xsum

# --------------------------------------------------------------------------
# Interval join: for every purchase, the count/value of the same
# user's views in the preceding hour. Left join keeps zero-view
# purchases (the reference's keep-and-flag miss path, vs its A12
# miss-drop inner join).
# --------------------------------------------------------------------------

_INTERVAL_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT user_id, ts AS vts, value FROM events WHERE event_type = 'view'
)
SELECT p.event_id, p.user_id, p.ts,
       CAST(COUNT(v.vts) AS BIGINT) AS n_prior_views,
       CAST(COALESCE(SUM(CAST(v.value AS DECIMAL(18,2))),
                     CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS prior_view_value
FROM p LEFT JOIN v
  ON v.user_id = p.user_id
 AND v.vts >= p.ts - INTERVAL 1 HOUR
 AND v.vts < p.ts
GROUP BY p.event_id, p.user_id, p.ts
"""


@register("events_interval_join_views", _INTERVAL_ORACLE)
def events_interval_join_views(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("vts"),
        F.col("value").alias("v_value"),
    )
    joined = purchases.join(
        views,
        (F.col("v_user_id") == F.col("user_id"))
        & (F.col("vts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("vts") < F.col("ts")),
        "left",
    )
    return joined.groupBy("event_id", "user_id", "ts").agg(
        F.count("vts").alias("n_prior_views"),
        F.coalesce(xsum(cents("v_value"), 2, 18), F.lit(0).cast("double"))
        .alias("prior_view_value"),
    )


# --------------------------------------------------------------------------
# Gap fill + forward fill: per-user daily value totals densified over
# each user's own active span; missing days carry the last observed
# value forward. The fill uses the run-group trick (cumulative count
# of non-nulls defines a group containing exactly one observation) —
# portable to any engine, no IGNORE NULLS needed.
# --------------------------------------------------------------------------

_GAPFILL_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,2))) AS day_value
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
),
spine AS (
  SELECT b.user_id, CAST(u.d AS DATE) AS day
  FROM bounds b, UNNEST(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS u(d)
),
joined AS (
  SELECT s.user_id, s.day, d.day_value FROM spine s
  LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
),
grouped AS (
  SELECT user_id, day, day_value,
         COUNT(day_value) OVER (PARTITION BY user_id ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS grp
  FROM joined
)
SELECT user_id, day,
       CAST(MAX(day_value) OVER (PARTITION BY user_id, grp) AS DOUBLE)
         AS filled_value,
       day_value IS NULL AS is_gap
FROM grouped
"""


@register("events_gapfill_forward", _GAPFILL_ORACLE)
def events_gapfill_forward(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).agg(xsum(cents("value"), 2, 18).alias("day_value"))
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grouped = joined.withColumn("grp", F.count("day_value").over(w_run))
    return grouped.select(
        "user_id",
        "day",
        F.max("day_value")
        .over(Window.partitionBy("user_id", "grp"))
        .cast("double")
        .alias("filled_value"),
        F.col("day_value").isNull().alias("is_gap"),
    )


# --------------------------------------------------------------------------
# Histogram: 10 equal-width bins over the observed [min, max] value
# range. Pass 1 is a single scalar aggregate (broadcast back); pass 2
# bins every row with pure arithmetic — identical IEEE double ops in
# both engines, so bucket assignment is bit-stable.
# --------------------------------------------------------------------------

_HISTOGRAM_ORACLE = """
WITH stats AS (
  SELECT MIN(value) AS lo, MAX(value) AS hi FROM events
)
SELECT CAST(LEAST(FLOOR((e.value - s.lo) / ((s.hi - s.lo) / 10)), 9) AS BIGINT)
         AS bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(e.value) AS bin_min,
       MAX(e.value) AS bin_max,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events e, stats s
GROUP BY bin_id
"""


@register("events_histogram_bins", _HISTOGRAM_ORACLE)
def events_histogram_bins(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    stats = e.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = e.crossJoin(F.broadcast(stats)).select(
        F.least(
            F.floor(
                (F.col("value") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / F.lit(10))
            ),
            F.lit(9).cast("bigint"),
        ).alias("bin_id"),
        "value",
    )
    return binned.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("value").alias("bin_min"),
        F.max("value").alias("bin_max"),
        xsum(cents("value"), 2, 18).alias("total_value"),
    )
