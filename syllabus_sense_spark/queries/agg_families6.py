"""Aggregate-surface batch 6: the native SQL aggregate forms not yet
exercised as first-class queries — FILTER (WHERE) clauses, exact
median over integers, the boolean aggregate family, functionally-
dependent any_value, and ROLLUP with GROUPING_ID level labels.

Exactness notes:
- ``median`` over integer cents interpolates at most one midpoint
  (a+b)/2 of two int64s far below 2^53 — exact in DOUBLE and computed
  identically by both engines (Spark ``median`` = continuous p50,
  DuckDB ``median`` likewise).
- ``any_value`` is nondeterministic UNLESS the column is functionally
  dependent on the group key — here c_name is keyed by c_custkey, so
  every pick is the same value (that is the documented contract for
  using any_value at all: carry a dependent attribute through a
  grouping without adding it to the key, saving a wide shuffle key
  at scale).
- GROUPING_ID is engine-defined bit order (Spark and DuckDB agree:
  leftmost grouping column = most significant bit); asserting it in
  the hash pins the rollup-level labeling.

Reference anchor: none (engine relational surface per SURVEY.md §2's
group-by-aggregate family rows).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2, xsum_total

_FILTER_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT)
         AS n_discounted,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            FILTER (WHERE l_quantity >= 25) AS BIGINT) AS cents_bulk,
       CAST(COUNT(DISTINCT l_suppkey) FILTER (WHERE l_returnflag = 'R')
            AS BIGINT) AS n_return_suppliers
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_filter_clause", _FILTER_ORACLE)
def agg_filter_clause(spark, sf_dir):
    """FILTER (WHERE ...) on count/sum/count-distinct — the SQL-native
    conditional aggregate (one pass, no CASE scaffolding; each filter
    prunes rows before the aggregate buffer, identical plan shape to
    the CASE form but the declared intent survives into the plan)."""
    l = load(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("lineitem")
    return spark.sql("""
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT)
               AS n_discounted,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT))
                  FILTER (WHERE l_quantity >= 25) AS BIGINT) AS cents_bulk,
             CAST(COUNT(DISTINCT l_suppkey) FILTER (WHERE l_returnflag = 'R')
                  AS BIGINT) AS n_return_suppliers
      FROM lineitem
      GROUP BY l_returnflag
    """)


_MEDIAN_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(median(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS DOUBLE) AS median_cents
FROM orders
GROUP BY o_orderpriority
"""


@register("agg_median_exact", _MEDIAN_ORACLE)
def agg_median_exact(spark, sf_dir):
    """Native median() per group over integer cents — continuous p50,
    at most one (a+b)/2 midpoint of int64s << 2^53, exact in DOUBLE in
    both engines. An ordered-set aggregate inside the hash agg, not a
    global sort."""
    o = load(spark, sf_dir, "orders")
    c_total = cents("o_totalprice")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.median(c_total).cast("double").alias("median_cents"),
    )


_BOOL_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_large,
       bool_and(o_totalprice > 900) AS all_over_900,
       bool_or(o_totalprice > 500000) AS any_over_500k
FROM orders
GROUP BY o_orderstatus
"""


@register("agg_count_if_bools", _BOOL_ORACLE)
def agg_count_if_bools(spark, sf_dir):
    """count_if / bool_and / bool_or — the boolean aggregate family
    (predicate pushup into the aggregate buffer: 1-bit state per
    group, map-side combinable)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_if(F.col("o_totalprice") > 100000).alias("n_large"),
        F.bool_and(F.col("o_totalprice") > 900).alias("all_over_900"),
        F.bool_or(F.col("o_totalprice") > 500000).alias("any_over_500k"),
    )


_ANYVAL_ORACLE = """
SELECT o.o_custkey,
       any_value(c.c_name) AS customer_name,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS cents
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY o.o_custkey
HAVING COUNT(*) >= 10
"""


@register("agg_any_value_functional", _ANYVAL_ORACLE)
def agg_any_value_functional(spark, sf_dir):
    """any_value over a FUNCTIONALLY DEPENDENT column (c_name is keyed
    by the c_custkey group key) — deterministic by construction, and
    the production reason the function exists: carry the attribute
    without widening the shuffle key."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_custkey")
        .agg(
            F.any_value(F.col("c_name")).alias("customer_name"),
            F.count(F.lit(1)).alias("n_orders"),
            xsum_total(cents("o_totalprice")).cast("long").alias("cents"),
        )
        .filter(F.col("n_orders") >= 10)
    )


_GROUPING_ID_ORACLE = """
SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
       COALESCE(l_linestatus, '<all>') AS linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
         AS level_id,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("agg_rollup_grouping_id", _GROUPING_ID_ORACLE)
def agg_rollup_grouping_id(spark, sf_dir):
    """ROLLUP with GROUPING() level labels — the bit flags distinguish
    a real NULL key from a rollup super-aggregate row (the classic
    cube-labeling trap); spelled as GROUPING()*2+GROUPING() so the
    value is engine-order-independent."""
    l = load(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("lineitem")
    return spark.sql("""
      SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
             COALESCE(l_linestatus, '<all>') AS linestatus,
             CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                  AS BIGINT) AS level_id,
             CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """)
