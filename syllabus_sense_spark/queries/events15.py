"""Equi-depth (quantile) binning — the data-dependent counterpart of
`events_histogram_bins`' fixed-width buckets: decile boundaries come
from the data itself (`percentile_disc` ordered-set aggregates, the
same exact idiom as `orders_ship_lag_sla`), and every row is assigned
the first decile whose upper boundary bounds it. Ties at a boundary
are deterministic because percentile_disc returns actual data values
and assignment is `value <= boundary` in both engines on exact
DECIMAL(18,2).

Scale posture: boundary computation is ONE ordered-set aggregate
(inside the hash agg, no global sort of the fact table); the 1-row
boundary table broadcasts into the assignment scan; per-decile
reduction is map-side combined. The output is always exactly ≤10
rows at any data size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import dec2

_PCTS = [i / 10 for i in range(1, 10)]


def _bounds_sql(col: str) -> str:
    return ", ".join(
        f"percentile_disc({p}) WITHIN GROUP (ORDER BY {col}) AS b{i}"
        for i, p in enumerate(_PCTS, start=1)
    )


_CASE = (
    "CASE "
    + " ".join(f"WHEN v <= b{i} THEN {i}" for i in range(1, 10))
    + " ELSE 10 END"
)

_EQUIDEPTH_ORACLE = f"""
WITH vals AS (
  SELECT CAST(value AS DECIMAL(18,2)) AS v FROM events
),
bounds AS (
  SELECT {_bounds_sql('v')} FROM vals
),
assigned AS (
  SELECT {_CASE} AS decile, v FROM vals CROSS JOIN bounds
)
SELECT CAST(decile AS INT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(v) * 100 AS BIGINT) AS lo_cents,
       CAST(MAX(v) * 100 AS BIGINT) AS hi_cents,
       CAST(SUM(v) * 100 AS BIGINT) AS sum_cents
FROM assigned GROUP BY decile
"""


@register("events_equidepth_deciles", _EQUIDEPTH_ORACLE)
def events_equidepth_deciles(spark, sf_dir):
    vals = load(spark, sf_dir, "events").select(dec2("value").alias("v"))
    bounds = vals.agg(
        *[
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY v)"
            ).alias(f"b{i}")
            for i, p in enumerate(_PCTS, start=1)
        ]
    )
    assigned = vals.join(F.broadcast(bounds)).select(
        F.expr(_CASE).alias("decile"), "v"
    )
    return assigned.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.min("v") * 100).cast("bigint").alias("lo_cents"),
        (F.max("v") * 100).cast("bigint").alias("hi_cents"),
        (F.sum("v") * 100).cast("bigint").alias("sum_cents"),
    ).select(
        F.col("decile").cast("int").alias("decile"),
        "n",
        "lo_cents",
        "hi_cents",
        "sum_cents",
    )
