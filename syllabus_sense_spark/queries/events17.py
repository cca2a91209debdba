"""Time-series forensics batch: CUSUM change-point scan, MAD robust
outliers, and signup→purchase latency percentiles — the monitoring
trio (`events_anomaly_zscore` flags points; these find level SHIFTS,
resist heavy tails, and time the funnel).

Exactness: the CUSUM statistic is kept scale-free and integer by
working with ``cnt·n_days − total`` (deviation from the mean times
n — same argmax, no division anywhere); MAD runs entirely in
DECIMAL(18,2) ordered-set aggregates; latency percentiles are
percentile_disc over integer minutes.

Scale posture: each query reduces the fact table ONCE (map-side
combined groupBy); every window/scan after that runs on the reduced
table (days, event types, or users).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import dec2, epoch_us

_US_PER_DAY = 86_400_000_000
_US_PER_MIN = 60_000_000

# --- CUSUM change-point over daily volumes ---------------------------

_CUSUM_ORACLE = f"""
WITH d AS (
  SELECT epoch_us(ts) // {_US_PER_DAY} AS day, COUNT(*) AS cnt
  FROM events GROUP BY 1
),
t AS (
  SELECT day, cnt,
         cnt * (SELECT COUNT(*) FROM d) - (SELECT SUM(cnt) FROM d) AS dev
  FROM d
),
s AS (
  SELECT day, cnt, dev,
         SUM(dev) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cusum
  FROM t
)
SELECT CAST(day AS BIGINT) AS day,
       CAST(cnt AS BIGINT) AS cnt,
       CAST(cusum AS BIGINT) AS cusum_scaled,
       CAST(CASE WHEN ROW_NUMBER() OVER (
              ORDER BY ABS(cusum) DESC, day ASC) = 1
            THEN 1 ELSE 0 END AS INT) AS is_changepoint
FROM s
"""


@register("events_changepoint_cusum", _CUSUM_ORACLE)
def events_changepoint_cusum(spark, sf_dir):
    d = (
        load(spark, sf_dir, "events")
        .select(epoch_us(F.col("ts")).alias("us"))
        .select(F.expr(f"us DIV {_US_PER_DAY}").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # scalars + windows all run on the ~|days|-row reduced table
    tot = d.agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("cnt").alias("total")
    )
    t = d.join(F.broadcast(tot)).select(
        "day", "cnt", (F.col("cnt") * F.col("n_days") - F.col("total")).alias("dev")
    )
    w_run = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = t.select(
        "day", "cnt", F.sum("dev").over(w_run).alias("cusum")
    )
    w_rank = Window.orderBy(F.abs(F.col("cusum")).desc(), F.asc("day"))
    return s.select(
        F.col("day").cast("bigint").alias("day"),
        F.col("cnt").cast("bigint").alias("cnt"),
        F.col("cusum").cast("bigint").alias("cusum_scaled"),
        F.when(F.row_number().over(w_rank) == 1, 1)
        .otherwise(0)
        .cast("int")
        .alias("is_changepoint"),
    )


# --- MAD robust outliers per event type ------------------------------

_MAD_ORACLE = """
WITH v AS (
  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v FROM events
),
med AS (
  SELECT event_type,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS med
  FROM v GROUP BY event_type
),
dev AS (
  SELECT v.event_type, v.v, m.med, ABS(v.v - m.med) AS adev
  FROM v JOIN med m ON m.event_type = v.event_type
),
mad AS (
  SELECT event_type,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY adev) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(d.med) * 100 AS BIGINT) AS med_cents,
       CAST(MAX(m2.mad) * 100 AS BIGINT) AS mad_cents,
       CAST(SUM(CASE WHEN d.adev > 3 * m2.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev d JOIN mad m2 ON m2.event_type = d.event_type
GROUP BY d.event_type
"""


@register("events_anomaly_mad", _MAD_ORACLE)
def events_anomaly_mad(spark, sf_dir):
    v = load(spark, sf_dir, "events").select(
        "event_type", dec2("value").alias("v")
    )
    # Spark's percentile_disc surfaces DOUBLE even over DECIMAL input
    # (33.55 → 33.549999…); the chosen element IS an exact 2-dp value,
    # so casting straight back to DECIMAL(18,2) restores it losslessly
    # and keeps the ×100 integer scaling exact (DuckDB stays DECIMAL
    # throughout).
    med = v.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)")
        .cast("decimal(18,2)")
        .alias("med")
    )
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type", "v", "med", F.abs(F.col("v") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)")
        .cast("decimal(18,2)")
        .alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.max("med") * 100).cast("bigint").alias("med_cents"),
            (F.max("mad") * 100).cast("bigint").alias("mad_cents"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


# --- signup → purchase latency percentiles ---------------------------

_LATENCY_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS s_us,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p_us
  FROM events GROUP BY user_id
),
conv AS (
  SELECT (p_us - s_us) // {_US_PER_MIN} AS minutes
  FROM u WHERE s_us IS NOT NULL AND p_us IS NOT NULL AND p_us >= s_us
)
SELECT CAST((SELECT COUNT(*) FROM u) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_converted,
       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY minutes) AS BIGINT)
         AS p50_minutes,
       CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY minutes) AS BIGINT)
         AS p90_minutes,
       CAST(MAX(minutes) AS BIGINT) AS max_minutes
FROM conv
"""


@register("events_funnel_latency", _LATENCY_ORACLE)
def events_funnel_latency(spark, sf_dir):
    u = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_type", epoch_us(F.col("ts")).alias("us"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "signup", F.col("us"))
            ).alias("s_us"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("us"))
            ).alias("p_us"),
        )
    )
    n_users = u.agg(F.count(F.lit(1)).alias("n_users"))
    conv = u.filter(
        F.col("s_us").isNotNull()
        & F.col("p_us").isNotNull()
        & (F.col("p_us") >= F.col("s_us"))
    ).select(F.expr(f"(p_us - s_us) DIV {_US_PER_MIN}").alias("minutes"))
    return conv.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY minutes)")
        .cast("bigint")
        .alias("p50_minutes"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY minutes)")
        .cast("bigint")
        .alias("p90_minutes"),
        F.max("minutes").cast("bigint").alias("max_minutes"),
    ).join(F.broadcast(n_users)).select(
        "n_users", "n_converted", "p50_minutes", "p90_minutes", "max_minutes"
    )
