"""Rolling-window active users — per-day DAU, trailing-7-day WAU and
the DAU/WAU stickiness ratio, the product-analytics companion to
`events_cohort_retention` (calendar cohorts) and
`window_distinct_users_running` (cumulative distinct).

A trailing distinct-count window cannot be expressed as a running
aggregate (distinct doesn't subtract), and a per-day self-join of the
event table re-reads facts 7×. The distributed form: reduce events to
the DISTINCT (user, day) presence table once (ONE shuffle), then
expand each presence row map-side to the 7 window-ends it
contributes to (a bounded 7× fan-out of the already-reduced presence
table — at 100 TB that table is ~|users|·|active days|, orders of
magnitude below the fact table), and count distinct users per
window-end. Days are exact integer epoch-day numbers; stickiness is
exact BIGINT ppm (DAU·1e6 ≤ 1e9·1e6 ≪ 2⁶³).

Only days with actual activity are emitted (inner join DAU×WAU), so
the output is identical under any partitioning of the input.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import epoch_us

_US_PER_DAY = 86_400_000_000
_W = 7  # trailing window in days

_STICKINESS_ORACLE = f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_US_PER_DAY} AS day
  FROM events
),
dau AS (
  SELECT day, COUNT(*) AS dau FROM ud GROUP BY day
),
expanded AS (
  SELECT user_id, day + g AS wend
  FROM ud, UNNEST([0, 1, 2, 3, 4, 5, 6]) AS t(g)
),
wau AS (
  SELECT wend AS day, COUNT(DISTINCT user_id) AS wau
  FROM expanded GROUP BY wend
)
SELECT CAST(d.day AS BIGINT) AS day,
       CAST(d.dau AS BIGINT) AS dau,
       CAST(w.wau AS BIGINT) AS wau,
       d.dau * 1000000 // w.wau AS stickiness_ppm
FROM dau d JOIN wau w ON w.day = d.day
"""


@register("events_stickiness_dau_wau", _STICKINESS_ORACLE)
def events_stickiness_dau_wau(spark, sf_dir):
    ud = (
        load(spark, sf_dir, "events")
        .select("user_id", epoch_us(F.col("ts")).alias("us"))
        .select("user_id", F.expr(f"us DIV {_US_PER_DAY}").alias("day"))
        .distinct()
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    expanded = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + (_W - 1))).alias(
            "wend"
        ),
    )
    wau = expanded.groupBy(F.col("wend").alias("day")).agg(
        F.count_distinct("user_id").alias("wau")
    )
    return dau.join(wau, "day").select(
        F.col("day").cast("bigint").alias("day"),
        F.col("dau").cast("bigint").alias("dau"),
        F.col("wau").cast("bigint").alias("wau"),
        F.expr("dau * 1000000 DIV wau").alias("stickiness_ppm"),
    )
