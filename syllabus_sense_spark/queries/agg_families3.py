"""Aggregate families, batch 3: ordered-set aggregates
(``percentile_disc`` WITHIN GROUP) and arg-extremum aggregates
(``max_by`` / ``min_by``).

Cross-engine determinism notes:

- ``percentile_disc`` *selects* an existing value (smallest value with
  cumulative distribution >= p) — no interpolation arithmetic, so both
  engines return the identical element; only the final cast to double
  touches floating point. ``percentile_cont`` interpolates in double
  and its expression tree differs between engines, so the continuous
  variant is deliberately not oracle-hashed.
- ``max_by``/``min_by`` have undefined tie semantics in every dialect,
  so the ordering metric is made collision-free: acctbal in exact
  integer cents * 2^20 + the unique customer key. Both engines compare
  the identical bigint, so the winner is total-order deterministic.

Reference anchor: the reference tracks per-topic extrema only
implicitly (first/last element of a topic's slice,
syllabus_parser.py:139-149); these are the engine-level generalized
forms.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_PCT_ORACLE = """
SELECT
  l_returnflag,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(quantile_disc(l_quantity, 0.25) AS DOUBLE) AS qty_p25,
  CAST(quantile_disc(l_quantity, 0.50) AS DOUBLE) AS qty_p50,
  CAST(quantile_disc(l_quantity, 0.75) AS DOUBLE) AS qty_p75,
  CAST(quantile_disc(l_quantity, 0.95) AS DOUBLE) AS qty_p95,
  CAST(quantile_disc(CAST(l_extendedprice AS DECIMAL(18,2)), 0.50) AS DOUBLE)
    AS price_p50
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_percentile_disc", _PCT_ORACLE)
def agg_percentile_disc(spark, sf_dir):
    # Discrete percentiles per return flag: one hash-agg shuffle on the
    # (tiny) group key; Spark's percentile_disc is an ordered-set
    # aggregate evaluated inside the agg, not a global sort.
    l = load(spark, sf_dir, "lineitem")

    def pd(p, col):
        return F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY {col})")

    return l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        pd(0.25, "l_quantity").cast("double").alias("qty_p25"),
        pd(0.50, "l_quantity").cast("double").alias("qty_p50"),
        pd(0.75, "l_quantity").cast("double").alias("qty_p75"),
        pd(0.95, "l_quantity").cast("double").alias("qty_p95"),
        pd(0.50, "CAST(l_extendedprice AS DECIMAL(18,2))")
        .cast("double")
        .alias("price_p50"),
    )


# Collision-free ordering metric: exact cents (bigint) shifted left 20
# bits + the unique customer key (< 2^20 at any harness sf). Identical
# arithmetic in both engines; no ties possible.
_METRIC_SQL = (
    "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * 1048576 + c_custkey"
)

_ARG_ORACLE = f"""
SELECT
  c_nationkey,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  arg_max(c_name, {_METRIC_SQL}) AS richest_customer,
  CAST(arg_max(CAST(c_acctbal AS DECIMAL(18,2)), {_METRIC_SQL}) AS DOUBLE)
    AS richest_acctbal,
  arg_min(c_name, {_METRIC_SQL}) AS poorest_customer,
  CAST(arg_min(CAST(c_acctbal AS DECIMAL(18,2)), {_METRIC_SQL}) AS DOUBLE)
    AS poorest_acctbal
FROM customer
GROUP BY c_nationkey
"""


@register("agg_max_by_min_by", _ARG_ORACLE)
def agg_max_by_min_by(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    metric = (
        F.col("c_acctbal").cast("decimal(18,2)") * 100
    ).cast("bigint") * 1048576 + F.col("c_custkey")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    return c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.max_by(F.col("c_name"), metric).alias("richest_customer"),
        F.max_by(bal, metric).cast("double").alias("richest_acctbal"),
        F.min_by(F.col("c_name"), metric).alias("poorest_customer"),
        F.min_by(bal, metric).cast("double").alias("poorest_acctbal"),
    )


