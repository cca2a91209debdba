"""Relational coverage, batch 2: TPC-H-shaped query adaptations over
the harness schema (EXISTS/NOT EXISTS, correlated scalar subqueries,
HAVING, disjunctive predicate pushdown, CASE aggregation, pivot,
grouping sets, multiset set-ops, percentiles).

Where a query is most naturally SQL, it runs through ``spark.sql``
over temp views — same Catalyst plan, exercising the SQL surface the
reference's users would reach for.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load, load_all
from . import register
from ._util import cents, dec2, hundredths, xsum

# --- q4 shape: EXISTS semi-join with a correlated predicate ---------------

_Q4_ORACLE = """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority
"""


@register("q4_priority_late_ships", _Q4_ORACLE)
def q4_priority_late_ships(spark, sf_dir):
    load_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o.o_orderpriority
        """
    )


# --- q10 shape: returned-item revenue, top 20 customers -------------------

_Q10_ORACLE = """
SELECT
  c.c_custkey,
  c.c_name,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
           * CAST(1 - CAST(l.l_discount AS DECIMAL(18,2)) AS DECIMAL(3,2))) AS DOUBLE)
    AS revenue,
  n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_revenue", _Q10_ORACLE)
def q10_returned_revenue(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    revenue = cents("l_extendedprice") * hundredths("l_discount")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(xsum(revenue, 4, 22).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --- q12 shape: CASE aggregation over quantity bands ----------------------

_Q12_ORACLE = """
SELECT
  CASE WHEN l_quantity < 10 THEN 'small'
       WHEN l_quantity < 30 THEN 'medium'
       ELSE 'large' END AS qty_band,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
    AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
    AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""


@register("q12_priority_by_band", _Q12_ORACLE)
def q12_priority_by_band(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    band = (
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .otherwise("large")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(band.alias("qty_band"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- q14 shape: promo revenue share (ratio of conditional sums) -----------

_Q14_ORACLE = """
SELECT
  100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
      THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
           * CAST(1 - CAST(l.l_discount AS DECIMAL(18,2)) AS DECIMAL(3,2))
      ELSE CAST(0 AS DECIMAL(21,4)) END) AS DOUBLE)
  / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * CAST(1 - CAST(l.l_discount AS DECIMAL(18,2)) AS DECIMAL(3,2))) AS DOUBLE)
  AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
"""


@register("q14_promo_revenue", _Q14_ORACLE)
def q14_promo_revenue(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    revenue = cents("l_extendedprice") * hundredths("l_discount")
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(
        F.lit(0).cast("long")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * xsum(promo, 4, 22)
                / xsum(revenue, 4, 22)
            ).alias("promo_revenue_pct")
        )
    )


# --- q18 shape: HAVING on a grouped fact, joined back ---------------------

_Q18_ORACLE = """
SELECT
  c.c_name,
  o.o_orderkey,
  o.o_orderdate,
  CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
  CAST(big.total_qty AS DOUBLE) AS total_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
) big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


@register("q18_large_volume_orders", _Q18_ORACLE)
def q18_large_volume_orders(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec2("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


# --- q19 shape: disjunctive multi-attribute predicates --------------------

_Q19_ORACLE = """
SELECT
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
           * CAST(1 - CAST(l.l_discount AS DECIMAL(18,2)) AS DECIMAL(3,2))) AS DOUBLE)
    AS revenue,
  COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'BRAND#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 10)
   OR (p.p_brand = 'BRAND#2' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity >= 20)
   OR (p.p_type = 'PROMO' AND l.l_quantity < 10)
"""


@register("q19_disjunctive_filters", _Q19_ORACLE)
def q19_disjunctive_filters(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    revenue = cents("l_extendedprice") * hundredths("l_discount")
    cond = (
        ((F.col("p_brand") == "BRAND#1") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "BRAND#2") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 20))
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") < 10))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(xsum(revenue, 4, 22).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


# --- q22 shape: NOT EXISTS + uncorrelated scalar subquery -----------------

_Q22_ORACLE = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS v
  FROM customer WHERE c_acctbal > 0
)
SELECT
  c.c_mktsegment,
  COUNT(*) AS n_customers,
  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.v
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c.c_mktsegment
"""


@register("q22_idle_rich_customers", _Q22_ORACLE)
def q22_idle_rich_customers(spark, sf_dir):
    load_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT
          c.c_mktsegment,
          COUNT(*) AS n_customers,
          CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM customer c
        WHERE c.c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
            FROM customer WHERE c_acctbal > 0
          )
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY c.c_mktsegment
        """
    )


# --- correlated scalar subquery: price equals brand max -------------------

_CORR_ORACLE = """
SELECT p.p_partkey, p.p_brand, p.p_retailprice
FROM part p
WHERE p.p_retailprice = (
  SELECT MAX(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
)
"""


@register("subquery_brand_max_price", _CORR_ORACLE)
def subquery_brand_max_price(spark, sf_dir):
    load_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT p.p_partkey, p.p_brand, p.p_retailprice
        FROM part p
        WHERE p.p_retailprice = (
          SELECT MAX(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
        )
        """
    )


# --- pivot: one row per priority, one count column per status -------------

_PIVOT_ORACLE = """
SELECT
  o_orderpriority,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
FROM orders
GROUP BY o_orderpriority
"""


@register("pivot_status_counts", _PIVOT_ORACLE)
def pivot_status_counts(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.coalesce(F.count(F.lit(1)), F.lit(0)))
        .select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("status_f"),
            F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("status_o"),
            F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("status_p"),
        )
    )


# --- grouping sets beyond rollup/cube -------------------------------------

_GSETS_ORACLE = """
SELECT r.r_name, c.c_mktsegment, COUNT(*) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY GROUPING SETS ((r.r_name), (c.c_mktsegment))
"""


@register("agg_grouping_sets", _GSETS_ORACLE)
def agg_grouping_sets(spark, sf_dir):
    load_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT r.r_name, c.c_mktsegment, COUNT(*) AS n_customers
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY GROUPING SETS ((r.r_name), (c.c_mktsegment))
        """
    )


# --- multiset set-ops (ALL variants) --------------------------------------

_INTERSECT_ALL_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


@register("set_intersect_all_multiset", _INTERSECT_ALL_ORACLE)
def set_intersect_all_multiset(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersectAll(op)


_EXCEPT_ALL_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


@register("set_except_all_multiset", _EXCEPT_ALL_ORACLE)
def set_except_all_multiset(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.exceptAll(op)


# --- exact percentiles (linear interpolation) -----------------------------

_PCT_ORACLE = """
SELECT
  o_orderstatus,
  CAST(floor(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) * 1e4) AS BIGINT) AS p50_e4,
  CAST(floor(CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE) * 1e4) AS BIGINT) AS p90_e4,
  CAST(floor(CAST(quantile_cont(o_totalprice, 0.99) AS DOUBLE) * 1e4) AS BIGINT) AS p99_e4
FROM orders
GROUP BY o_orderstatus
"""


@register("agg_percentiles_exact", _PCT_ORACLE)
def agg_percentiles_exact(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.floor(F.percentile("o_totalprice", F.lit(0.5)) * F.lit(1e4))
        .cast("bigint")
        .alias("p50_e4"),
        F.floor(F.percentile("o_totalprice", F.lit(0.9)) * F.lit(1e4))
        .cast("bigint")
        .alias("p90_e4"),
        F.floor(F.percentile("o_totalprice", F.lit(0.99)) * F.lit(1e4))
        .cast("bigint")
        .alias("p99_e4"),
    )


# --- unpivot / melt (wide → long reshaping) -------------------------------
# Spark's df.unpivot (Catalyst Unpivot node) vs a UNION ALL oracle —
# the relational definition of melt, kept in lockstep column-for-column.

_UNPIVOT_ORACLE = """
WITH per_nation AS (
  SELECT c_nationkey,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
         CAST(COUNT(*) AS DOUBLE) AS n_customers,
         CAST(MAX(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS max_bal
  FROM customer GROUP BY c_nationkey
)
SELECT c_nationkey, 'total_bal' AS metric, total_bal AS value FROM per_nation
UNION ALL
SELECT c_nationkey, 'n_customers' AS metric, n_customers AS value FROM per_nation
UNION ALL
SELECT c_nationkey, 'max_bal' AS metric, max_bal AS value FROM per_nation
"""


@register("unpivot_nation_metrics", _UNPIVOT_ORACLE)
def unpivot_nation_metrics(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    wide = c.groupBy("c_nationkey").agg(
        xsum(cents("c_acctbal"), 2, 18).alias("total_bal"),
        F.count(F.lit(1)).cast("double").alias("n_customers"),
        F.max(dec2("c_acctbal")).cast("double").alias("max_bal"),
    )
    return wide.unpivot(
        ids=["c_nationkey"],
        values=["total_bal", "n_customers", "max_bal"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# --- deterministic systematic sampling ------------------------------------
# Random TABLESAMPLE can never hash-match across engines; the
# reproducible form — hash-modulo systematic sampling — can, and is
# also the production shape (stable across reruns and engines).

_SAMPLE_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12)) AS BIGINT)
      % 20 = 0
"""


@register("sample_systematic_hash", _SAMPLE_ORACLE)
def sample_systematic_hash(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    return o.filter(h % 20 == 0).select("o_orderkey", "o_custkey", "o_totalprice")
