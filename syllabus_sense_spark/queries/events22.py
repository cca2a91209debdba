"""Time-series smoothing + sequence-mining batch.

`events_ewma_daily`: exponentially weighted moving average of daily
event counts, α = 1/2, as PURE INTEGER fixed-point arithmetic. The
usual recursive EWMA is a float scan (order-dependent, engine-
divergent); instead the geometric weights are truncated at K = 20
row-based lags and scaled by 2^(K-1), so the smoothed value is an
exact integer dot product of the last 20 daily counts with powers of
two — identical in both engines, zero floats. Missing leading history
is zero-padded (lag default 0), the deterministic cold-start.

`events_trigram_paths`: per-user ordered 3-grams of event types (the
sequence-mining step past the 2-gram transition matrix) — two lags
over a (user, ts, event_id) window, exact global counts.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import epoch_us

_US_PER_DAY = 86_400_000_000
_K = 20  # truncation horizon: 2^-20 tail mass < 1e-6, below the ppm grain
_DENOM = 2**_K - 1  # Σ_{i=0..K-1} 2^(K-1-i)

# Σ_{i=0..K-1} lag(cnt, i, 0) · 2^(K-1-i): same text works in both
# engines (lag with an explicit default, integer literals)
_EWMA_TERMS = " + ".join(
    f"lag(cnt, {i}, 0) OVER w * {2 ** (_K - 1 - i)}" for i in range(_K)
)

_EWMA_ORACLE = f"""
WITH daily AS (
  SELECT event_type, epoch_us(ts) // {_US_PER_DAY} AS day,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT event_type, CAST(day AS BIGINT) AS day, CAST(cnt AS BIGINT) AS cnt,
       CAST(({_EWMA_TERMS}) AS BIGINT) AS ewma_num,
       CAST(({_EWMA_TERMS}) * 1000 // {_DENOM} AS BIGINT) AS ewma_milli
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day ASC)
"""


@register("events_ewma_daily", _EWMA_ORACLE)
def events_ewma_daily(spark, sf_dir):
    daily = (
        load(spark, sf_dir, "events")
        .select("event_type", epoch_us(F.col("ts")).alias("us"))
        .select("event_type", F.expr(f"us DIV {_US_PER_DAY}").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("event_type").orderBy(F.asc("day"))
    num = sum(
        (F.lag("cnt", i, 0).over(w) * (2 ** (_K - 1 - i)) for i in range(_K)),
        F.lit(0),
    )
    return daily.select(
        "event_type",
        F.col("day").cast("bigint").alias("day"),
        F.col("cnt").cast("bigint").alias("cnt"),
        num.cast("bigint").alias("ewma_num"),
        (num * 1000).cast("bigint").alias("_n1000"),
    ).select(
        "event_type",
        "day",
        "cnt",
        "ewma_num",
        F.expr(f"_n1000 DIV {_DENOM}").alias("ewma_milli"),
    )


_TRIGRAM_ORACLE = """
WITH seq AS (
  SELECT user_id,
         lag(event_type, 2) OVER w AS t1,
         lag(event_type, 1) OVER w AS t2,
         event_type AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)
)
SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n_paths
FROM seq WHERE t1 IS NOT NULL
GROUP BY 1, 2, 3
"""


@register("events_trigram_paths", _TRIGRAM_ORACLE)
def events_trigram_paths(spark, sf_dir):
    e = load(spark, sf_dir, "events").select(
        "user_id",
        epoch_us(F.col("ts")).alias("us"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("us"), F.asc("event_id"))
    seq = e.select(
        F.lag("event_type", 2).over(w).alias("t1"),
        F.lag("event_type", 1).over(w).alias("t2"),
        F.col("event_type").alias("t3"),
    )
    return (
        seq.filter(F.col("t1").isNotNull())
        .groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_paths"))
    )
