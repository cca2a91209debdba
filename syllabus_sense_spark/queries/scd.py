"""Type-2 slowly-changing-dimension build: collapse an event stream
into validity intervals.

The classic warehouse shape: per user, consecutive runs of the same
status (event_type) become one row with ``[valid_from, valid_to)``
bounds; the final run stays open (``valid_to IS NULL``,
``is_current``). Every step — change flag, run id, interval bounds —
is windowed over the same ``user_id`` partitioning, so the whole
build is ONE shuffle on the dimension's natural key and scales with
users × changes, never events².

Ordering is total (``ts, event_id``) so run boundaries are
deterministic under timestamp ties in any engine.

Reference anchor: the reference tracks a mutable per-row ``status``
field (planned → generating, data_types.py:62-68,
syllabus_ai_graph.py:175-176); SCD2 is the engine-grade version that
keeps the history instead of overwriting it.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register

_SCD2_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(event_type) OVER w IS NULL
                   OR LAG(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS changed
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, ts, event_type,
         SUM(changed) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS run_id
  FROM flagged
),
intervals AS (
  SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
         event_type AS status,
         MIN(ts) AS valid_from,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM runs GROUP BY user_id, run_id, event_type
)
SELECT user_id, run_id, status, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
         AS valid_to,
       n_events,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
         IS NULL AS is_current
FROM intervals
"""


def scd2_intervals(e):
    """(user_id, run_id, status, valid_from, n_events) from an event
    DataFrame — the shared interval builder (one user_id shuffle)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run_frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("event_type").over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(prev.isNull() | (prev != F.col("event_type")), 1)
        .otherwise(0)
        .alias("changed"),
    )
    runs = flagged.withColumn("run_id", F.sum("changed").over(run_frame))
    return runs.groupBy(
        "user_id",
        F.col("run_id").cast("bigint").alias("run_id"),
        F.col("event_type").alias("status"),
    ).agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register("scd2_user_status", _SCD2_ORACLE)
def scd2_user_status(spark, sf_dir):
    intervals = scd2_intervals(load(spark, sf_dir, "events"))
    w_iv = Window.partitionBy("user_id").orderBy("valid_from")
    valid_to = F.lead("valid_from").over(w_iv)
    return intervals.select(
        "user_id",
        "run_id",
        "status",
        "valid_from",
        valid_to.alias("valid_to"),
        "n_events",
        valid_to.isNull().alias("is_current"),
    )


# --------------------------------------------------------------------------
# Point-in-time lookup: the user's last non-purchase state at the
# moment of each purchase. Composes the SCD2 dimension with the
# as-of operator (operators/asof.py) — union + one user_id window,
# never a nested-loop range join, so the lookup costs one shuffle
# regardless of dimension size.
# --------------------------------------------------------------------------

_PIT_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(event_type) OVER w IS NULL
                   OR LAG(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS changed
  FROM events WHERE event_type <> 'purchase'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, ts, event_type,
         SUM(changed) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS run_id
  FROM flagged
),
intervals AS (
  SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
         event_type AS status, MIN(ts) AS valid_from
  FROM runs GROUP BY user_id, run_id, event_type
),
p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, i.status, i.run_id,
       i.status IS NOT NULL AS matched
FROM p LEFT JOIN LATERAL (
  SELECT status, run_id FROM intervals i
  WHERE i.user_id = p.user_id AND i.valid_from <= p.ts
  ORDER BY i.valid_from DESC LIMIT 1
) i ON true
"""


@register("scd2_point_in_time", _PIT_ORACLE)
def scd2_point_in_time(spark, sf_dir):
    from ..operators.asof import asof_join

    e = load(spark, sf_dir, "events")
    dim = scd2_intervals(e.filter(F.col("event_type") != "purchase")).select(
        "user_id", "run_id", "status", "valid_from"
    )
    probes = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        probes,
        dim,
        on="user_id",
        left_time="ts",
        right_time="valid_from",
        value_cols=["status", "run_id"],
        how="left",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "status",
        "run_id",
        F.col("status").isNotNull().alias("matched"),
    )
