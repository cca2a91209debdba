"""Moving median — exact order statistics over a sliding window, the
robust companion to `window_moving_average`. Spark has no percentile
window function, so the window's rows are materialized explicitly
(collect_list over a ROWS frame — bounded by the window width, 7
values, at any data scale) and the median is element_at(sorted,
(n+1)/2) — the lower median, pure integer arithmetic end-to-end. The
DuckDB oracle builds the identical list-sort-index expression rather
than its native windowed median (whose interpolation convention for
even windows differs).

One shuffle on user_id; the frame never exceeds 7 elements per row.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2, epoch_us

_W = 7  # trailing rows (current + 6 preceding)

_MOVING_MEDIAN_ORACLE = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
lw AS (
  SELECT user_id, us, event_id, cents,
         list_sort(list(cents) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN {_W - 1} PRECEDING AND CURRENT ROW
         )) AS win
  FROM e
)
SELECT user_id, CAST(us AS BIGINT) AS us,
       CAST(event_id AS BIGINT) AS event_id, cents,
       CAST(len(win) AS INT) AS n_in_window,
       CAST(win[(len(win) + 1) // 2] AS BIGINT) AS moving_median_cents
FROM lw
"""


@register("window_moving_median", _MOVING_MEDIAN_ORACLE)
def window_moving_median(spark, sf_dir):
    e = load(spark, sf_dir, "events").select(
        "user_id",
        epoch_us(F.col("ts")).alias("us"),
        "event_id",
        cents("value").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-(_W - 1), Window.currentRow)
    )
    lw = e.withColumn("win", F.sort_array(F.collect_list("cents").over(w)))
    return lw.select(
        "user_id",
        F.col("us").cast("bigint").alias("us"),
        F.col("event_id").cast("bigint").alias("event_id"),
        "cents",
        F.size("win").cast("int").alias("n_in_window"),
        F.element_at(
            "win", ((F.size("win") + 1) / 2).cast("int")
        )
        .cast("bigint")
        .alias("moving_median_cents"),
    )
