"""Audience overlap — pairwise Jaccard between event-type user sets
(the co-occurrence matrix product analytics runs to answer "do the
people who search also purchase?").

Set similarity between GROUPS, not documents: |A∩B| comes from the
per-user distinct type set exploded into ordered type pairs (the
same one-shuffle collect_set pairing as the market-basket operator —
never a users×users or types×types scan over raw events), |A∪B| =
|A|+|B|−|A∩B| by inclusion-exclusion from the per-type distinct
counts, and the Jaccard lands as integer ppm.

Scale posture: one distinct + collect_set shuffle on user_id (the
per-user type set is bounded by the type vocabulary, so the map-side
pair fan-out is at most |types|² per user); the per-type count table
is |types| rows and broadcasts. Output is |types|² / 2 rows no
matter how many events.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_OVERLAP_ORACLE = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
),
sizes AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ut GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, sa.n AS n_a, sb.n AS n_b, p.n_both,
       CAST(p.n_both * 1000000 // (sa.n + sb.n - p.n_both) AS BIGINT)
         AS jaccard_ppm
FROM pairs p
JOIN sizes sa ON sa.event_type = p.type_a
JOIN sizes sb ON sb.event_type = p.type_b
"""


@register("events_audience_overlap", _OVERLAP_ORACLE)
def events_audience_overlap(spark, sf_dir):
    ut = load(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    # one shuffle: per-user sorted type set, ordered pairs map-side
    baskets = ut.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("ts")
    )
    opened = baskets.select("ts", F.posexplode("ts").alias("i", "type_a"))
    pairs = (
        opened.select(
            "type_a",
            F.explode(
                F.slice(
                    "ts", F.col("i") + F.lit(2), F.size("ts") - F.col("i") - F.lit(1)
                )
            ).alias("type_b"),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            F.expr("n_both * 1000000 DIV (n_a + n_b - n_both)").alias("jaccard_ppm"),
        )
    )
