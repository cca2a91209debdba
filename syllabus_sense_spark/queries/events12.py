"""Concurrent-sessions sweep line — interval stabbing over session
intervals ("how many sessions were active at once?"), the
capacity-planning twin of the sessionization family.

The sequential algorithm sorts all boundaries and runs one global
cumsum — not distributable as stated. The distributed form exploits
that concurrency REPORTING is bucketed anyway: per hour bucket,
count session starts and ends (map-side combined, any parallelism),
then the running sum over the HOUR table — which is tiny at any data
scale (8,760 rows/year at 100 TB as at 1 GB) — gives active-session
counts at each hour boundary: active(H) = Σ_{h≤H} (starts − ends).
The global-order step runs on the pre-reduced table, never the data.

Sessions are the 30-minute gap sessions of the sessionize family
(same cumsum construction as `events_sessionize_native`'s oracle,
with end = last event — concurrency counts REAL activity spans, not
the +gap gracetime).

Output per hour bucket: starts, ends, active at end of hour. All
integer.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import epoch_us

_GAP_US = 30 * 60 * 1_000_000
_US_PER_HOUR = 3_600_000_000

_CONCURRENCY_ORACLE = f"""
WITH o AS (
  SELECT user_id, epoch_us(ts) AS us FROM events
),
g AS (
  SELECT user_id, us,
         CASE WHEN LAG(us) OVER w IS NULL
                   OR us - LAG(us) OVER w >= {_GAP_US}
              THEN 1 ELSE 0 END AS brk
  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us)
),
s AS (
  SELECT user_id, us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
),
sessions AS (
  SELECT MIN(us) AS start_us, MAX(us) AS end_us
  FROM s GROUP BY user_id, sid
),
hours AS (
  SELECT start_us // {_US_PER_HOUR} AS hour, 1 AS starts, 0 AS ends
  FROM sessions
  UNION ALL
  SELECT end_us // {_US_PER_HOUR} AS hour, 0 AS starts, 1 AS ends
  FROM sessions
),
hourly AS (
  SELECT hour, CAST(SUM(starts) AS BIGINT) AS n_starts,
         CAST(SUM(ends) AS BIGINT) AS n_ends
  FROM hours GROUP BY hour
)
SELECT CAST(hour AS BIGINT) AS hour, n_starts, n_ends,
       CAST(SUM(n_starts - n_ends) OVER (
         ORDER BY hour ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS active_end
FROM hourly
"""


@register("events_concurrent_sessions", _CONCURRENCY_ORACLE)
def events_concurrent_sessions(spark, sf_dir):
    e = load(spark, sf_dir, "events").select(
        "user_id", epoch_us(F.col("ts")).alias("us")
    )
    w_lag = Window.partitionBy("user_id").orderBy("us")
    g = e.select(
        "user_id",
        "us",
        F.when(
            F.lag("us").over(w_lag).isNull()
            | (F.col("us") - F.lag("us").over(w_lag) >= _GAP_US),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    w_sid = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = (
        g.withColumn("sid", F.sum("brk").over(w_sid))
        .groupBy("user_id", "sid")
        .agg(F.min("us").alias("start_us"), F.max("us").alias("end_us"))
    )
    hours = sessions.select(
        F.expr(f"start_us DIV {_US_PER_HOUR}").alias("hour"),
        F.lit(1).alias("starts"),
        F.lit(0).alias("ends"),
    ).unionByName(
        sessions.select(
            F.expr(f"end_us DIV {_US_PER_HOUR}").alias("hour"),
            F.lit(0).alias("starts"),
            F.lit(1).alias("ends"),
        )
    )
    hourly = hours.groupBy("hour").agg(
        F.sum("starts").cast("bigint").alias("n_starts"),
        F.sum("ends").cast("bigint").alias("n_ends"),
    )
    # running sum over the PRE-REDUCED hour table (8,760 rows/year at
    # any data scale) — the one place a global-order window is correct
    w_run = Window.orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return hourly.select(
        F.col("hour").cast("bigint").alias("hour"),
        "n_starts",
        "n_ends",
        F.sum(F.col("n_starts") - F.col("n_ends")).over(w_run)
        .cast("bigint")
        .alias("active_end"),
    )
