"""Event debounce — time-based dedup, the batch twin of
`streaming_dedup_drain`'s bounded-state watermark dedup.

Telemetry pipelines receive bursts of near-identical events (retry
storms, double-clicks, at-least-once producers). The debounce rule:
keep an event iff the previous event with the same (user, type) key
is more than N minutes older (or there is none). Unlike exact dedup
(same payload) or sessionization (gap GROUPS), debounce is a
per-event KEEP/DROP decision off one LAG — a single window over the
key partition, exact integer microsecond arithmetic.

Output: per event type, total vs kept counts and kept-fraction in
ppm — the suppression report a dedup stage logs.

Scale posture: one hash shuffle on (user_id, event_type) — the
natural key partition; the lag window runs inside each partition
(spill-safe sort), and the rollup is map-side combined. Same shape
as `events_sessionize_gap30m`, which shares the shuffle key — at
100 TB the two stages pipeline on one exchange.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import epoch_us

_DEBOUNCE_US = 5 * 60 * 1_000_000  # 5 minutes

_DEBOUNCE_ORACLE = f"""
WITH laggy AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY epoch_us(ts), event_id
         ) AS gap_us
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > {_DEBOUNCE_US}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > {_DEBOUNCE_US}
                     THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
         AS kept_ppm
FROM laggy GROUP BY event_type
"""


@register("events_debounce_5m", _DEBOUNCE_ORACLE)
def events_debounce_5m(spark, sf_dir):
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", epoch_us(F.col("ts")).alias("us")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    laggy = e.select(
        "event_type", (F.col("us") - F.lag("us").over(w)).alias("gap_us")
    )
    kept = F.when(
        F.col("gap_us").isNull() | (F.col("gap_us") > _DEBOUNCE_US), 1
    ).otherwise(0)
    return (
        laggy.select("event_type", kept.alias("keep"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("keep").alias("n_kept"),
        )
        .select(
            "event_type",
            "n_total",
            "n_kept",
            F.expr("n_kept * 1000000 DIV n_total").alias("kept_ppm"),
        )
    )
