"""Event analytics batch 7: daily-count anomaly detection by z-score
against each event type's own history.

Determinism discipline: a naive ``stddev`` over doubles is
order-dependent; here the daily counts are exact integers, so the
variance comes from exact integer moments — n, Σx, Σx² aggregate as
bigints (counts are small enough that Σx² fits comfortably), and the
z-score is computed in a fixed sequence of double ops on those exact
integers: mean = Σx/n, var = (n·Σx² − (Σx)²) / n², z = (x − mean) /
sqrt(var). Both engines execute the identical IEEE expression tree,
and the output column is integer-scaled (floor(z·1e6) as bigint)
rather than round(z, 6): floor of bit-identical doubles is identical
everywhere, while round-half conventions differ between engines.

Shape at scale: one tumbling aggregate (events → daily counts, the
hypertable rollup), one tiny per-type moment aggregate broadcast back
via an equi-join on the bounded type key, then a pure projection.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_ANOMALY_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
moments AS (
  SELECT event_type,
         COUNT(*) AS n_days,
         CAST(SUM(n_events) AS BIGINT) AS sum_x,
         CAST(SUM(n_events * n_events) AS BIGINT) AS sum_x2
  FROM daily GROUP BY event_type
)
SELECT d.event_type, d.day, CAST(d.n_events AS BIGINT) AS n_events,
       CAST(floor(
         (CAST(d.n_events AS DOUBLE) - (CAST(m.sum_x AS DOUBLE) / m.n_days))
         / sqrt(((CAST(m.n_days AS DOUBLE) * m.sum_x2) - (CAST(m.sum_x AS DOUBLE) * m.sum_x))
                / (CAST(m.n_days AS DOUBLE) * m.n_days))
         * 1e6) AS BIGINT) AS zscore_e6
FROM daily d JOIN moments m ON m.event_type = d.event_type
WHERE abs(
    (CAST(d.n_events AS DOUBLE) - (CAST(m.sum_x AS DOUBLE) / m.n_days))
    / sqrt(((CAST(m.n_days AS DOUBLE) * m.sum_x2) - (CAST(m.sum_x AS DOUBLE) * m.sum_x))
           / (CAST(m.n_days AS DOUBLE) * m.n_days))) >= 2.0
"""


@register("events_anomaly_zscore", _ANOMALY_ORACLE)
def events_anomaly_zscore(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    moments = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_events").cast("bigint").alias("sum_x"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("bigint").alias("sum_x2"),
    )
    j = daily.join(F.broadcast(moments), "event_type")
    mean = F.col("sum_x").cast("double") / F.col("n_days")
    var = (
        (F.col("n_days").cast("double") * F.col("sum_x2"))
        - (F.col("sum_x").cast("double") * F.col("sum_x"))
    ) / (F.col("n_days").cast("double") * F.col("n_days"))
    z = (F.col("n_events").cast("double") - mean) / F.sqrt(var)
    return (
        j.filter(F.abs(z) >= 2.0)
        .select(
            "event_type",
            "day",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.floor(z * F.lit(1e6)).cast("bigint").alias("zscore_e6"),
        )
    )




# --------------------------------------------------------------------------
# Sequential pattern mining: top-k 3-event user-journey paths — the
# ordered-sequence complement of events_transition_matrix (which sees
# only pairwise hops, losing path context).
#
# Scale shape: one groupBy(user_id) collects each user's ordered
# event sequence (bounded by per-user activity; at web scale cap with
# ``slice`` exactly like copurchase baskets), the 3-gram paths
# explode map-side from the sorted array, and the count aggregates on
# a key space bounded by |event_types|³ — never by corpus size. The
# final top-k carries a total tiebreak (count desc, path asc) so the
# LIMIT is deterministic in both engines. Ordering inside a user is
# (ts, event_id): event_id is unique, so array_sort on the struct and
# the oracle's ORDER BY agree on a total order.
# --------------------------------------------------------------------------

_TOP_PATHS_ORACLE = """
WITH seq AS (
  SELECT user_id, list(event_type ORDER BY ts, event_id) AS s
  FROM events GROUP BY user_id
),
grams AS (
  SELECT g.path FROM seq,
  UNNEST(CASE WHEN len(s) >= 3
     THEN list_transform(range(len(s)-2),
                         i -> s[i+1] || '>' || s[i+2] || '>' || s[i+3])
     ELSE [] END) AS g(path)
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_journeys
FROM grams GROUP BY path
ORDER BY n_journeys DESC, path
LIMIT 10
"""


@register("events_top_paths", _TOP_PATHS_ORACLE)
def events_top_paths(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    seq = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("es")
    )
    grams = seq.select(
        F.explode(
            F.when(
                F.size("es") >= 3,
                F.expr(
                    "transform(sequence(1, size(es) - 2),"
                    " i -> concat(es[i-1].event_type, '>',"
                    " es[i].event_type, '>', es[i+1].event_type))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("path")
    )
    return (
        grams.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_journeys"))
        .orderBy(F.col("n_journeys").desc(), F.col("path"))
        .limit(10)
    )
