"""Core relational surface (SURVEY.md §2 Table B: joins, aggregation,
set ops, sort/limit) over the harness star schema.

Scale notes per query are inline. General posture: filters first (so
Catalyst pushes them into the parquet scan), small dimensions
broadcast, large joins shuffle on their natural keys, aggregations are
partial+final hash aggs (free in Spark).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2, hundredths, xavg, xsum

# --------------------------------------------------------------------------
# q1: full-scan group-aggregate (TPC-H Q1 shape). The workhorse agg:
# 2-phase hash aggregate, no join, pushdown-able date filter. At 100 TB
# this is scan-bound; the decimal cast is codegen'd JVM-side.
# --------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(3,2))) AS DOUBLE)
    AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(3,2))
           * CAST(1 + CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(3,2))) AS DOUBLE)
    AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", _Q1_ORACLE)
def q1_pricing_summary(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    # Scaled-long exact aggregation (guide §2.3): the decimal sums
    # these replace cost ~1.3 s/iter at sf0.1 in boxed BigDecimal
    # buffer adds; the long twins are bit-identical (law + bitwise
    # A/B in tests/test_scaled_long_agg.py) and run in ~0.36 s.
    qc = cents("l_quantity")
    pc = cents("l_extendedprice")
    disc_price = pc * hundredths("l_discount")
    charge = disc_price * hundredths("l_tax", plus=True)
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            xsum(qc, 2, 18).alias("sum_qty"),
            xsum(pc, 2, 18).alias("sum_base_price"),
            xsum(disc_price, 4, 22).alias("sum_disc_price"),
            xsum(charge, 6, 26).alias("sum_charge"),
            xavg(qc, 2, 18).alias("avg_qty"),
            xavg(pc, 2, 18).alias("avg_price"),
            xavg(cents("l_discount"), 2, 18).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q3: selective 3-way join + top-k (TPC-H Q3 shape). customer is the
# small side (broadcast); orders⋈lineitem shuffles on orderkey. Top-k
# is a global sort-limit — Spark takes k per partition then merges, so
# no full sort materializes at scale.
# --------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT
  l.l_orderkey,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
           * CAST(1 - CAST(l.l_discount AS DECIMAL(18,2)) AS DECIMAL(3,2))) AS DOUBLE)
    AS revenue,
  o.o_orderdate,
  o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", _Q3_ORACLE)
def q3_shipping_priority(spark, sf_dir):
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01 00:00:00").cast("timestamp")
    )
    revenue = cents("l_extendedprice") * hundredths("l_discount")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(xsum(revenue, 4, 22).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q5: 6-table join (TPC-H Q5 shape). region/nation/supplier/customer
# are all broadcast-able dims; only orders⋈lineitem is a real shuffle.
# The c_nationkey = s_nationkey predicate is the classic join-graph
# cycle Catalyst handles via join reordering.
# --------------------------------------------------------------------------

_Q5_ORACLE = """
SELECT
  n.n_name,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
           * CAST(1 - CAST(l.l_discount AS DECIMAL(18,2)) AS DECIMAL(3,2))) AS DOUBLE)
    AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
"""


@register("q5_local_supplier_volume", _Q5_ORACLE)
def q5_local_supplier_volume(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = cents("l_extendedprice") * hundredths("l_discount")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(xsum(revenue, 4, 22).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Broadcast equi join (reference A12: the in-memory subtopic lookup,
# syllabus_ai_graph.py:191-201). part is the small dim → broadcast hash
# join, zero shuffle of the big fact side.
# --------------------------------------------------------------------------

_BROADCAST_ORACLE = """
SELECT
  p.p_brand,
  COUNT(*) AS n_items,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
           * CAST(1 - CAST(l.l_discount AS DECIMAL(18,2)) AS DECIMAL(3,2))) AS DOUBLE)
    AS revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""


@register("join_broadcast_lookup", _BROADCAST_ORACLE)
def join_broadcast_lookup(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    revenue = cents("l_extendedprice") * hundredths("l_discount")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_items"), xsum(revenue, 4, 22).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Left outer join with null handling — the keep-and-flag variant of
# the reference's miss-drop join (syllabus_ai_graph.py:199-201).
# --------------------------------------------------------------------------

_LEFT_OUTER_ORACLE = """
SELECT
  c.c_custkey,
  c.c_name,
  COUNT(o.o_orderkey) AS n_orders,
  CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent,
  CASE WHEN COUNT(o.o_orderkey) = 0 THEN 'no_orders' ELSE 'has_orders' END AS order_flag
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_name
"""


@register("join_left_outer_flag", _LEFT_OUTER_ORACLE)
def join_left_outer_flag(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(xsum(cents("o_totalprice"), 2, 18), F.lit(0).cast("double"))
            .alias("total_spent"),
        )
        .withColumn(
            "order_flag",
            F.when(F.col("n_orders") == 0, F.lit("no_orders")).otherwise(
                F.lit("has_orders")
            ),
        )
    )


# --------------------------------------------------------------------------
# Semi / anti joins — existence predicates without row multiplication.
# Semi/anti never duplicate the left side, so they shuffle strictly
# less than inner joins at scale.
# --------------------------------------------------------------------------

_SEMI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
"""


@register("join_left_semi", _SEMI_ORACLE)
def join_left_semi(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


_ANTI_ORACLE = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
)
"""


@register("join_left_anti", _ANTI_ORACLE)
def join_left_anti(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


# --------------------------------------------------------------------------
# Non-equi (range/theta) join against a tiny in-line band dimension —
# BroadcastNestedLoop is the right physical plan because the dim is
# 3 rows; the alternative CASE WHEN would hide the join capability.
# --------------------------------------------------------------------------

_RANGE_ORACLE = """
SELECT
  b.band,
  COUNT(*) AS n_items,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS band_value
FROM lineitem l
JOIN (VALUES ('low', 0, 20000), ('mid', 20000, 60000), ('high', 60000, 200000))
  AS b(band, lo, hi)
  ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
GROUP BY b.band
"""


@register("join_range_bands", _RANGE_ORACLE)
def join_range_bands(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [("low", 0, 20000), ("mid", 20000, 60000), ("high", 60000, 200000)],
        "band string, lo int, hi int",
    )
    return (
        l.join(
            F.broadcast(bands),
            (l.l_extendedprice >= bands.lo) & (l.l_extendedprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            xsum(cents("l_extendedprice"), 2, 18).alias("band_value"),
        )
    )


# --------------------------------------------------------------------------
# Cross join — small × small only (anything else is a design error at
# scale); region × order-status matrix with observed counts.
# --------------------------------------------------------------------------

_CROSS_ORACLE = """
SELECT r.r_name, s.o_orderstatus
FROM region r
CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
"""


@register("join_cross_matrix", _CROSS_ORACLE)
def join_cross_matrix(spark, sf_dir):
    r = load(spark, sf_dir, "region").select("r_name")
    s = load(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s)


# --------------------------------------------------------------------------
# Rollup / cube — hierarchical aggregates in one pass (Spark expands
# grouping sets before the shuffle; partial aggregation still applies).
# --------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT
  r.r_name,
  n.n_name,
  COUNT(*) AS n_suppliers,
  CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
"""


@register("agg_rollup_region_nation", _ROLLUP_ORACLE)
def agg_rollup_region_nation(spark, sf_dir):
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            xsum(cents("s_acctbal"), 2, 18).alias("total_bal"),
        )
    )


_CUBE_ORACLE = """
SELECT
  o_orderstatus,
  o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("agg_cube_status_priority", _CUBE_ORACLE)
def agg_cube_status_priority(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        xsum(cents("o_totalprice"), 2, 18).alias("total_value"),
    )


# --------------------------------------------------------------------------
# Distinct aggregation. Exact count-distinct (shuffles on the distinct
# key). The approx_count_distinct scale path lives in tests (its HLL
# result can't hash-match an exact oracle by construction).
# --------------------------------------------------------------------------

_DISTINCT_ORACLE = """
SELECT
  c.c_mktsegment,
  COUNT(DISTINCT o.o_custkey) AS n_buyers,
  COUNT(DISTINCT CAST(o.o_orderdate AS DATE)) AS n_order_days,
  COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


@register("agg_count_distinct", _DISTINCT_ORACLE)
def agg_count_distinct(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_buyers"),
            F.countDistinct(F.col("o_orderdate").cast("date")).alias("n_order_days"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# Statistical moments from exact decimal sums (bit-stable variance; see
# queries/_util.py for why built-in var_samp over doubles can't be
# oracle-checked).
# --------------------------------------------------------------------------

_STATS_ORACLE = """
WITH s AS (
  SELECT
    l_returnflag,
    COUNT(*) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      AS sumsq_qty,
    CAST(MIN(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS min_qty,
    CAST(MAX(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS max_qty
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT
  l_returnflag, n, sum_qty, min_qty, max_qty,
  sum_qty / n AS mean_qty,
  (sumsq_qty - sum_qty * sum_qty / n) / (n - 1) AS var_qty
FROM s
"""


@register("agg_stats_moments", _STATS_ORACLE)
def agg_stats_moments(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    q = dec2("l_quantity")
    qc = cents("l_quantity")
    base = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        xsum(qc, 2, 18).alias("sum_qty"),
        xsum(qc * qc, 4, 37).alias("sumsq_qty"),
        F.min(q).cast("double").alias("min_qty"),
        F.max(q).cast("double").alias("max_qty"),
    )
    return base.select(
        "l_returnflag",
        "n",
        "sum_qty",
        "min_qty",
        "max_qty",
        (F.col("sum_qty") / F.col("n")).alias("mean_qty"),
        (
            (F.col("sumsq_qty") - F.col("sum_qty") * F.col("sum_qty") / F.col("n"))
            / (F.col("n") - F.lit(1))
        ).alias("var_qty"),
    )


# --------------------------------------------------------------------------
# Set operations (reference A16 union-accumulate generalized).
# --------------------------------------------------------------------------

_INTERSECT_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                               AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                               AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
"""


@register("set_intersect_buyers", _INTERSECT_ORACLE)
def set_intersect_buyers(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    y1996 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")
    y1997 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")
    return y1996.intersect(y1997)


_EXCEPT_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                               AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                               AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
"""


@register("set_except_churned", _EXCEPT_ORACLE)
def set_except_churned(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    y1996 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")
    y1997 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")
    # subtract == EXCEPT (set semantics): any 1997 buyer is removed
    # regardless of 1996 multiplicity (exceptAll would keep survivors).
    return y1996.subtract(y1997)


# --------------------------------------------------------------------------
# Global sort + limit (reference A19 `topics_num` limit). Spark's
# TakeOrderedAndProject keeps only k rows per partition — no full sort.
# --------------------------------------------------------------------------

_TOP_ORDERS_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register("sort_limit_top_orders", _TOP_ORDERS_ORACLE)
def sort_limit_top_orders(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# The same range join, binned: intervals explode into fixed-width
# bins, the join becomes an equi-join on bin id + residual filter —
# the plan that survives when BOTH sides are large (the broadcast
# nested loop above cannot). Same oracle, same result.
# --------------------------------------------------------------------------


@register("join_range_binned", _RANGE_ORACLE)
def join_range_binned(spark, sf_dir):
    from ..operators.range_join import binned_range_join

    l = load(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [("low", 0, 20000), ("mid", 20000, 60000), ("high", 60000, 200000)],
        "band string, lo int, hi int",
    )
    joined = binned_range_join(
        l.select("l_extendedprice"), bands, "l_extendedprice", "lo", "hi",
        bin_width=10000,
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_items"),
        xsum(cents("l_extendedprice"), 2, 18).alias("band_value"),
    )


# --------------------------------------------------------------------------
# Salted skew join, surfaced as a query: the salt is internal plumbing
# (deterministic split + recombine), so the result — and the oracle —
# is exactly the plain equi-join.
# --------------------------------------------------------------------------

_SALTED_ORACLE = """
SELECT
  s.s_name,
  COUNT(*) AS n_items,
  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
GROUP BY s.s_name
"""


@register("join_salted_skew", _SALTED_ORACLE)
def join_salted_skew(spark, sf_dir):
    from ..operators.skew import salted_join

    l = load(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity"
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_name"
    )
    joined = salted_join(l, s, on="suppkey", salt=8)
    return joined.groupBy("s_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        xsum(cents("l_quantity"), 2, 18).alias("total_qty"),
    )
