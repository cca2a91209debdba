"""Window batch 6: IGNORE NULLS forward fill (LOCF) and rank-family
tie semantics — the two window surfaces the suite hadn't exercised.

``events_locf_forward_fill``: last-observation-carried-forward — the
time-series imputation everybody builds on last_value(IGNORE NULLS)
over ROWS UNBOUNDED PRECEDING. Sparse signal: only 'purchase' events
carry a fill value (exact cents); every other event inherits the most
recent purchase amount of the SAME user. Output is an exact integer
histogram keyed by filled/unfilled so the hash pins both the fill
values and the NULL frontier (events before a user's first purchase
stay NULL).

``window_dense_rank_ties``: rank() vs dense_rank() on deliberately
tied keys (cents DIV 1e6 coarsening) — rank jumps after ties,
dense_rank doesn't; emitting both plus the gap count per group pins
the tie semantics exactly.

Scale: both are partitioned windows (user_id / returnflag) — no
global sort; the window state is O(1) per row (LOCF carries one
value, ranks carry counters).

Reference anchor: none (engine window surface per SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, epoch_us

_LOCF_ORACLE = """
WITH ordered AS (
  SELECT user_id,
         epoch_us(ts) AS ts_us,
         event_id,
         CASE WHEN event_type = 'purchase'
              THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
              END AS purchase_cents
  FROM events
),
filled AS (
  SELECT user_id, event_id,
         last_value(purchase_cents IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS filled_cents
  FROM ordered
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN filled_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unfilled,
       CAST(SUM(COALESCE(filled_cents, 0)) AS BIGINT) AS sum_filled_cents
FROM filled
GROUP BY user_id
"""


@register("events_locf_forward_fill", _LOCF_ORACLE)
def events_locf_forward_fill(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    ordered = e.select(
        "user_id",
        epoch_us("ts").alias("ts_us"),
        "event_id",
        F.when(
            F.col("event_type") == "purchase",
            cents("value"),
        ).alias("purchase_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = ordered.withColumn(
        "filled_cents", F.last("purchase_cents", ignorenulls=True).over(w)
    )
    return filled.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("filled_cents").isNull(), 1).otherwise(0)).alias(
            "n_unfilled"
        ),
        F.sum(F.coalesce(F.col("filled_cents"), F.lit(0)))
        .cast("bigint")
        .alias("sum_filled_cents"),
    )


_DENSE_ORACLE = """
WITH coarse AS (
  SELECT l_returnflag,
         CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              // 1000000 AS BIGINT) AS band
  FROM lineitem
),
ranked AS (
  SELECT l_returnflag, band,
         RANK() OVER (PARTITION BY l_returnflag ORDER BY band) AS rnk,
         DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY band) AS drnk
  FROM coarse
)
SELECT l_returnflag, band,
       CAST(MIN(rnk) AS BIGINT) AS first_rank,
       CAST(MIN(drnk) AS BIGINT) AS dense_rank,
       CAST(COUNT(*) AS BIGINT) AS n_tied
FROM ranked
GROUP BY l_returnflag, band
"""


@register("window_dense_rank_ties", _DENSE_ORACLE)
def window_dense_rank_ties(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    coarse = l.select(
        "l_returnflag",
        F.expr(
            "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " DIV 1000000 AS BIGINT)"
        ).alias("band"),
    )
    w = Window.partitionBy("l_returnflag").orderBy("band")
    ranked = coarse.select(
        "l_returnflag",
        "band",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )
    return ranked.groupBy("l_returnflag", "band").agg(
        F.min("rnk").cast("long").alias("first_rank"),
        F.min("drnk").cast("long").alias("dense_rank"),
        F.count(F.lit(1)).alias("n_tied"),
    )
