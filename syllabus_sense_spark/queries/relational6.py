"""Time-series reporting over the order fact table: month-over-month
growth and ship-lag SLA percentiles — the two reports every warehouse
runs weekly, expressed as single-shuffle Spark plans.

Sign-safe growth ppm: Spark's ``DIV`` truncates toward zero while
DuckDB's ``//`` floors toward −∞ — they disagree exactly when the
numerator is negative (a shrinking month). Both sides therefore
compute the magnitude on a provably non-negative numerator and apply
the sign afterwards, which is floor-consistent in both engines.

Lag percentiles are ``percentile_disc`` ordered-set aggregates over
exact integer day lags (same idiom as `agg_percentile_disc`) —
evaluated inside the hash aggregate, not via a global sort.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2, epoch_us, xsum_total

_MOM_ORACLE = """
WITH m AS (
  SELECT o_orderpriority AS priority,
         year(o_orderdate) * 100 + month(o_orderdate) AS ym,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
),
l AS (
  SELECT priority, ym, n_orders, cents,
         LAG(n_orders) OVER (PARTITION BY priority ORDER BY ym) AS prev_n
  FROM m
)
SELECT priority, CAST(ym AS BIGINT) AS ym,
       CAST(n_orders AS BIGINT) AS n_orders, cents,
       CAST(CASE
         WHEN prev_n IS NULL THEN NULL
         WHEN n_orders >= prev_n
           THEN (n_orders - prev_n) * 1000000 // prev_n
         ELSE -((prev_n - n_orders) * 1000000 // prev_n)
       END AS BIGINT) AS growth_ppm
FROM l
"""


@register("orders_mom_growth", _MOM_ORACLE)
def orders_mom_growth(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        xsum_total(cents("o_totalprice")).cast("long").alias("cents"),
    )
    w = Window.partitionBy("priority").orderBy("ym")
    return m.withColumn("prev_n", F.lag("n_orders").over(w)).select(
        "priority",
        F.col("ym").cast("bigint").alias("ym"),
        F.col("n_orders").cast("bigint").alias("n_orders"),
        "cents",
        F.expr(
            "CAST(CASE"
            " WHEN prev_n IS NULL THEN NULL"
            " WHEN n_orders >= prev_n"
            "   THEN (n_orders - prev_n) * 1000000 DIV prev_n"
            " ELSE -((prev_n - n_orders) * 1000000 DIV prev_n)"
            " END AS BIGINT)"
        ).alias("growth_ppm"),
    )


_US_PER_DAY = 86_400_000_000

_SLA_ORACLE = f"""
WITH lag_days AS (
  SELECT o.o_orderpriority AS priority,
         CASE WHEN epoch_us(l.l_shipdate) >= epoch_us(o.o_orderdate)
              THEN (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
                   // {_US_PER_DAY}
              ELSE -((epoch_us(o.o_orderdate) - epoch_us(l.l_shipdate)
                      + {_US_PER_DAY} - 1) // {_US_PER_DAY})
         END AS days
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(MIN(days) AS BIGINT) AS min_days,
       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY days) AS BIGINT)
         AS p50_days,
       CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY days) AS BIGINT)
         AS p90_days,
       CAST(MAX(days) AS BIGINT) AS max_days
FROM lag_days GROUP BY priority
"""


@register("orders_ship_lag_sla", _SLA_ORACLE)
def orders_ship_lag_sla(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        epoch_us(F.col("o_orderdate")).alias("ous"),
    )
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", epoch_us(F.col("l_shipdate")).alias("lus")
    )
    # floor-consistent day division: Spark DIV truncates toward zero,
    # so negative lags (the synthetic data has pre-order ship dates)
    # route through an explicitly floored expression in BOTH engines
    lag_days = o.join(l, o.o_orderkey == l.l_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.expr(
            f"CASE WHEN lus >= ous THEN (lus - ous) DIV {_US_PER_DAY}"
            f" ELSE -((ous - lus + {_US_PER_DAY} - 1) DIV {_US_PER_DAY})"
            f" END"
        ).alias("days"),
    )
    return lag_days.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.min("days").cast("bigint").alias("min_days"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY days)")
        .cast("bigint")
        .alias("p50_days"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY days)")
        .cast("bigint")
        .alias("p90_days"),
        F.max("days").cast("bigint").alias("max_days"),
    )
