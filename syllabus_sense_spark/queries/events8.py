"""[EXT] Ordered funnel analysis over the events stream — the
classic product-analytics query (view → click → purchase, each step
strictly after the previous one's first occurrence).

Step semantics: a user is at step k when they have a step-k event
strictly later than their *first* step-(k-1) event. This is the
strict-ordering funnel (not "did all three ever happen"), which is
the version that needs real dataflow: each step is a min-timestamp
aggregation conditioned on the previous step's result.

Shape: three chained groupBy(user_id) aggregations, each following an
equi-join on user_id against the (much smaller) previous step table —
every join key is user_id, so at 100 TB the three steps reuse one
hash-partitioning of the events table and the step tables shrink
monotonically (funnel steps only lose users). The final output is
three 1-row counts combined by cross join — the broadcast-of-a-scalar
pattern this repo allowlists (each side is a single aggregate row).

Counts are BIGINT end-to-end; no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..tables import load
from . import register

_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM s1) AS step1_view,
       (SELECT COUNT(*) FROM s2) AS step2_click,
       (SELECT COUNT(*) FROM s3) AS step3_purchase
"""


def _first_after(
    events: DataFrame, prev: DataFrame, etype: str, prev_t: str, out_t: str
) -> DataFrame:
    return (
        events.filter(F.col("event_type") == etype)
        .join(prev, "user_id")
        .filter(F.col("ts") > F.col(prev_t))
        .groupBy("user_id")
        .agg(F.min("ts").alias(out_t))
    )


@register("events_funnel_ordered", _FUNNEL_ORACLE)
def events_funnel_ordered(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = _first_after(e, s1, "click", "t1", "t2")
    s3 = _first_after(e, s2, "purchase", "t2", "t3")
    return (
        s1.agg(F.count(F.lit(1)).alias("step1_view"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("step2_click")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("step3_purchase")))
    )
