"""Driver-verifiable Structured Streaming queries: each entry RUNS a
real streaming query (file source → availableNow drain → memory sink)
and returns the sink contents, paired with the equivalent BATCH SQL as
the DuckDB oracle — so streaming correctness carries a full
rows+schema+hash CORRECTNESS row, not just a pytest assertion.

Sound because ``trigger(availableNow=True)`` over a static directory
is deterministic: every file is processed exactly once, watermarks
never drop anything (all data is "on time" relative to the final
watermark), and the aggregates use the same exact-decimal discipline
as their batch twins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register

_HOURLY_ORACLE = """
SELECT
  date_trunc('hour', ts) AS window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register("streaming_tumbling_hourly_drain", _HOURLY_ORACLE)
def streaming_tumbling_hourly_drain(spark, sf_dir):
    from ..streaming import stream_hourly_counts

    q = stream_hourly_counts(spark, sf_dir, query_name="harness_hourly_drain")
    assert q.awaitTermination(600), "availableNow stream drain timed out"
    return spark.sql("SELECT * FROM harness_hourly_drain")


_ENRICH_ORACLE = """
SELECT e.event_id, e.user_id, e.event_type, e.ts,
       c.c_name AS customer_name,
       c.c_nationkey AS nation_key
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
"""


@register("streaming_static_enrich_drain", _ENRICH_ORACLE)
def streaming_static_enrich_drain(spark, sf_dir):
    from ..streaming import stream_enrich_static_dim

    q = stream_enrich_static_dim(spark, sf_dir, query_name="harness_enrich_drain")
    assert q.awaitTermination(600), "availableNow stream drain timed out"
    return spark.sql("SELECT * FROM harness_enrich_drain").select(
        "event_id", "user_id", "event_type", "ts", "customer_name", "nation_key"
    )


_SESSION_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS session_id
  FROM flagged
)
SELECT
  MIN(ts) AS session_start,
  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
  user_id,
  COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
"""


@register("streaming_session_windows_drain", _SESSION_ORACLE)
def streaming_session_windows_drain(spark, sf_dir):
    from ..streaming import stream_session_windows

    q = stream_session_windows(spark, sf_dir, query_name="harness_session_drain")
    assert q.awaitTermination(600), "availableNow stream drain timed out"
    return spark.sql("SELECT * FROM harness_session_drain")


