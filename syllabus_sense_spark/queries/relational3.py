"""TPC-H-shape queries, batch 3: the remaining shapes expressible over
the harness star schema (no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate`` columns exist, so Q9/Q21 are
adapted — noted per query — and Q2/Q11/Q20 live in ``relational4``
with ``lineitem`` standing in for the supply bridge).

Scale posture: every dimension (region 5, nation 25, supplier 100,
customer 1.5k, part 2k rows at sf0.01) is broadcast; only
lineitem⋈orders ever shuffles, on its join key. Aggregations follow
the exact-decimal discipline of ``_util`` so hashes are bit-stable
against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load, load_all
from . import register
from ._util import cents, hundredths, xsum

_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(3,2))"
)


def _rev_l():
    """Scaled-long (4 dp) revenue term — 10^4·(price·(1−disc)) as an
    exact long; aggregated via _util.xsum (bit-identical to the
    decimal-sum form it replaced, at long-sum cost)."""
    return cents("l_extendedprice") * hundredths("l_discount")


# --------------------------------------------------------------------------
# q6: forecasting revenue change — the pure scan+agg query. Predicates
# push into the parquet scan (shipdate range, discount band, quantity);
# no shuffle at all besides the final single-group reduce.
# --------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", _Q6_ORACLE)
def q6_forecast_revenue(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            xsum(cents("l_extendedprice") * cents("l_discount"), 4, 37).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# q7: volume shipping between two nations — lineitem⋈orders shuffle
# join with four broadcast dims; the nation-pair disjunction is applied
# after the joins (it needs both sides' nation names).
# --------------------------------------------------------------------------

_Q7_ORACLE = f"""
SELECT
  n1.n_name AS supp_nation,
  n2.n_name AS cust_nation,
  CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
  CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                       AND TIMESTAMP '1997-12-31 00:00:00'
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", _Q7_ORACLE)
def q7_volume_shipping(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(xsum(_rev_l(), 4, 22).alias("revenue"))


# --------------------------------------------------------------------------
# q8: national market share — a share-of-total over a 6-way join.
# Numerator and denominator are both exact decimal sums; the final
# ratio is one double division (bit-stable cross-engine).
# --------------------------------------------------------------------------

_Q8_ORACLE = f"""
SELECT
  CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
  CAST(CAST(SUM(CASE WHEN n1.n_name = 'NATION_5' THEN {_REV_SQL}
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(SUM({_REV_SQL}) AS DOUBLE) AS DOUBLE) AS mkt_share
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
JOIN region r ON n2.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN part p ON l.l_partkey = p.p_partkey
WHERE r.r_name = 'ASIA'
  AND p.p_type = 'ECONOMY'
  AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                        AND TIMESTAMP '1997-12-31 00:00:00'
GROUP BY o_year
"""


@register("q8_market_share", _Q8_ORACLE)
def q8_market_share(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
    )
    nation_rev = F.when(
        F.col("supp_nation") == "NATION_5", _rev_l()
    ).otherwise(F.lit(0).cast("long"))
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (xsum(nation_rev, 4, 22) / xsum(_rev_l(), 4, 22))
            .cast("double")
            .alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# q9: product-type profit (ADAPTED: the harness schema has no partsupp,
# so profit = discounted revenue without the supplycost term).
# --------------------------------------------------------------------------

_Q9_ORACLE = f"""
SELECT
  n.n_name AS nation,
  CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
  CAST(SUM({_REV_SQL}) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%gear%'
GROUP BY nation, o_year
"""


@register("q9_product_profit", _Q9_ORACLE)
def q9_product_profit(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    joined = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("long").alias("o_year"),
    ).agg(xsum(_rev_l(), 4, 22).alias("sum_profit"))


# --------------------------------------------------------------------------
# q13: customer order-count distribution — LEFT OUTER join preserved
# customers with zero orders, then a second aggregation over the first
# (distribution of counts). Two shuffles by construction.
# --------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
"""


@register("q13_customer_distribution", _Q13_ORACLE)
def q13_customer_distribution(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    counts = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return counts.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# q15: top supplier — an aggregate joined against its own MAX (scalar
# subquery). The revenue table is tiny (one row per supplier), so the
# max comparison is a broadcast of a 1-row aggregate.
# --------------------------------------------------------------------------

_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", _Q15_ORACLE)
def q15_top_supplier(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    revenue = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(xsum(_rev_l(), 4, 22).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# q17: small-quantity-order revenue — correlated scalar subquery
# (per-part average) decorrelated into an aggregate + equi-join, the
# rewrite Catalyst itself would produce. The per-part avg table is
# small (≤ #parts rows) and broadcasts.
# --------------------------------------------------------------------------

_Q17_ORACLE = """
WITH part_avg AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
           AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
            AS DOUBLE) AS avg_yearly,
       COUNT(*) AS n_small
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#15'
JOIN part_avg a ON a.l_partkey = l.l_partkey
WHERE l.l_quantity < 0.5 * a.avg_qty
"""


@register("q17_small_quantity_revenue", _Q17_ORACLE)
def q17_small_quantity_revenue(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#15")
    part_avg = l.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (xsum(cents("l_quantity"), 2, 18) / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(part_avg), l.l_partkey == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (xsum(cents("l_extendedprice"), 2, 18) / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


# --------------------------------------------------------------------------
# q21: suppliers who kept orders waiting (ADAPTED: no
# l_commitdate/l_receiptdate in the harness schema — "late" is
# l_shipdate > o_orderdate + 90 days). The EXISTS becomes a left-semi
# join, the NOT EXISTS a left-anti join, both on l_orderkey.
# --------------------------------------------------------------------------

_Q21_ORACLE = """
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
SELECT s.s_name, COUNT(*) AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (
  SELECT 1 FROM lineitem l2
  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
)
AND NOT EXISTS (
  SELECT 1 FROM late l3
  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
)
GROUP BY s.s_name
"""


@register("q21_waiting_suppliers", _Q21_ORACLE)
def q21_waiting_suppliers(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.alias("l1")
    l2 = l.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    with_other = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    sole_late = with_other.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        sole_late.join(F.broadcast(s), F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --------------------------------------------------------------------------
# q16: supplier-count by part attribute (ADAPTED: the harness has no
# partsupp table — lineitem is the part<->supplier bridge; the
# "customer complaints" exclusion becomes negative-balance suppliers).
# Shape under test: NOT IN anti-join feeding COUNT(DISTINCT) after a
# fact join, grouped by dimension attributes.
# --------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register("q16_supplier_part_counts", _Q16_ORACLE)
def q16_supplier_part_counts(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    complained = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        l.join(F.broadcast(complained), l.l_suppkey == complained.s_suppkey, "left_anti")
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Calendar densification via RECURSIVE CTE (Spark 4 WITH RECURSIVE):
# generate the month series, left-join monthly order activity, keep
# zero months visible — the gap-filling shape reports need and joins
# can't produce. Recursion is monotonic (bounded month increment), so
# UNION ALL terminates; cyclic-graph closure stays with the iterative
# connected-components operator in ext_graph.py, which is the shape
# that scales.
# --------------------------------------------------------------------------

_MONTHS_ORACLE = """
WITH RECURSIVE months(m) AS (
  SELECT DATE '1995-01-01'
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
  WHERE m < DATE '1996-12-01'
),
monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         COUNT(*) AS n_orders
  FROM orders
  GROUP BY 1
)
SELECT months.m AS month_start,
       CAST(COALESCE(monthly.n_orders, 0) AS BIGINT) AS n_orders,
       COALESCE(monthly.n_orders, 0) > 0 AS has_orders
FROM months LEFT JOIN monthly ON monthly.m = months.m
"""


@register("recursive_month_series", _MONTHS_ORACLE)
def recursive_month_series(spark, sf_dir):
    from ..tables import load_all

    load_all(spark, sf_dir)
    # The identical ANSI recursion runs in both engines — Spark 4's
    # WITH RECURSIVE executes it as an iterative union plan.
    return spark.sql(_MONTHS_ORACLE)


# --------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM): null keys MATCH
# each other — the semantics dedup/upsert pipelines need when the join
# key is nullable (a plain equi-join silently drops every null row).
# --------------------------------------------------------------------------

_NULLSAFE_ORACLE = """
WITH l AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS k
  FROM orders WHERE o_orderkey % 3 = 0
),
r AS (
  SELECT o_orderkey AS r_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderpriority END AS k
  FROM orders WHERE o_orderkey % 4 = 0
)
SELECT COALESCE(l.k, '<null>') AS key_val, COUNT(*) AS n_pairs
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
GROUP BY 1
"""


@register("join_null_safe_eq", _NULLSAFE_ORACLE)
def join_null_safe_eq(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    l = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderpriority"))
        .alias("k"),
    )
    r = o.filter(F.col("o_orderkey") % 4 == 0).select(
        F.col("o_orderkey").alias("r_orderkey"),
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_orderpriority"))
        .alias("k"),
    )
    # The join key has ~6 distinct values, so materializing the pair
    # blow-up before counting is quadratic (≈300M rows at sf0.1, and
    # hopeless at 100 TB). The scalable form of a pair COUNT over a
    # low-cardinality key: aggregate each side first, null-safe-join
    # the per-key counts (still `eqNullSafe` — the operator under
    # test), multiply. Identical output, linear cost.
    lc = l.groupBy("k").agg(F.count(F.lit(1)).alias("n_l"))
    rc = r.groupBy("k").agg(F.count(F.lit(1)).alias("n_r"))
    return (
        lc.join(rc, lc["k"].eqNullSafe(rc["k"]))
        .select(
            F.coalesce(lc["k"], F.lit("<null>")).alias("key_val"),
            (F.col("n_l") * F.col("n_r")).alias("n_pairs"),
        )
    )


# --------------------------------------------------------------------------
# Correlated scalar subquery in SELECT position (the WHERE-position
# variant is subquery_brand_max_price) — Catalyst rewrites it to a
# left outer aggregate join, the scalable form.
# --------------------------------------------------------------------------

_SCALAR_SELECT_ORACLE = """
SELECT
  r.r_name,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM nation n
   WHERE n.n_regionkey = r.r_regionkey) AS n_nations,
  (SELECT CAST(MAX(s.s_acctbal) AS DOUBLE) FROM supplier s
   JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
   WHERE n2.n_regionkey = r.r_regionkey) AS max_supplier_bal
FROM region r
"""


@register("subquery_scalar_in_select", _SCALAR_SELECT_ORACLE)
def subquery_scalar_in_select(spark, sf_dir):
    load_all(spark, sf_dir)
    return spark.sql(_SCALAR_SELECT_ORACLE)
