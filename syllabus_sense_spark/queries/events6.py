"""Event analytics batch 6: the event-type transition matrix — the
Markov-chain view of user behavior (what follows what), the input to
journey mining and anomaly detection on event streams.

One window shuffle on ``user_id`` (lag over event time with a total
tiebreak order), one small aggregate over the bounded
(from_type, to_type) key space. Probabilities are exact integer counts
divided once in double precision — bit-stable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register

_TRANSITION_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
counts AS (
  SELECT prev_type AS from_type, event_type AS to_type,
         COUNT(*) AS n_transitions
  FROM ordered WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
),
totals AS (
  SELECT from_type, SUM(n_transitions) AS n_from FROM counts GROUP BY from_type
)
SELECT c.from_type, c.to_type,
       CAST(c.n_transitions AS BIGINT) AS n_transitions,
       CAST(c.n_transitions AS DOUBLE) / t.n_from AS p_transition
FROM counts c JOIN totals t ON t.from_type = c.from_type
"""


@register("events_transition_matrix", _TRANSITION_ORACLE)
def events_transition_matrix(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    counts = ordered.groupBy(
        F.col("prev_type").alias("from_type"), F.col("event_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    w_tot = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        F.col("n_transitions").cast("bigint").alias("n_transitions"),
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w_tot)
        ).alias("p_transition"),
    )


