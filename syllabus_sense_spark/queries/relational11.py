"""Closing KPI batch: open-order aging, brand price index, the 80/20
check, and supplier-concentration HHI deciles — four one-screen
reports finishing the BI surface.

Aging is relative to the dataset's max order date (a deterministic
"as-of" — wall-clock now would break re-runs AND the oracle); the
price index and HHI use the documented fixed-order IEEE floor-ppm
(their BIGINT cross-products overflow at warehouse scale); the 80/20
row reuses the concentration machinery at a single cut point.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2, epoch_us, xsum_total

_US_PER_DAY = 86_400_000_000

_AGING_ORACLE = f"""
WITH maxd AS (SELECT MAX(epoch_us(o_orderdate)) AS mx FROM orders),
open_orders AS (
  SELECT (mx - epoch_us(o_orderdate)) // {_US_PER_DAY} AS days_open,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders CROSS JOIN maxd
  WHERE o_orderstatus = 'O'
)
SELECT CAST(CASE WHEN days_open <= 365 THEN 0
                 WHEN days_open <= 730 THEN 1
                 ELSE 2 END AS INT) AS age_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS cents,
       CAST(MIN(days_open) AS BIGINT) AS min_days,
       CAST(MAX(days_open) AS BIGINT) AS max_days
FROM open_orders GROUP BY 1
"""


@register("orders_open_aging", _AGING_ORACLE)
def orders_open_aging(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        "o_orderstatus",
        epoch_us(F.col("o_orderdate")).alias("us"),
        cents("o_totalprice").alias("cents"),
    )
    maxd = o.agg(F.max("us").alias("mx"))
    open_orders = (
        o.filter(F.col("o_orderstatus") == "O")
        .join(F.broadcast(maxd))
        .select(
            F.expr(f"(mx - us) DIV {_US_PER_DAY}").alias("days_open"),
            "cents",
        )
    )
    return open_orders.groupBy(
        F.expr(
            "CAST(CASE WHEN days_open <= 365 THEN 0"
            " WHEN days_open <= 730 THEN 1 ELSE 2 END AS INT)"
        ).alias("age_bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("cents"),
        F.min("days_open").cast("bigint").alias("min_days"),
        F.max("days_open").cast("bigint").alias("max_days"),
    )


_PRICE_INDEX_ORACLE = """
WITH b AS (
  SELECT p_brand, COUNT(*) AS n,
         CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM part GROUP BY p_brand
),
t AS (SELECT SUM(n) AS tn, SUM(cents) AS tc FROM b)
SELECT p_brand, CAST(n AS BIGINT) AS n_parts,
       CAST(FLOOR((CAST(cents AS DOUBLE) / CAST(n AS DOUBLE))
                  * 1000000.0
                  / (CAST(tc AS DOUBLE) / CAST(tn AS DOUBLE))) AS BIGINT)
         AS price_index_ppm
FROM b CROSS JOIN t
"""


@register("part_brand_price_index", _PRICE_INDEX_ORACLE)
def part_brand_price_index(spark, sf_dir):
    b = load(spark, sf_dir, "part").groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        xsum_total(cents("p_retailprice")).cast("long").alias("cents"),
    )
    t = b.agg(F.sum("n").alias("tn"), F.sum("cents").alias("tc"))
    return b.join(F.broadcast(t)).select(
        "p_brand",
        F.col("n").cast("bigint").alias("n_parts"),
        F.expr(
            "CAST(FLOOR((CAST(cents AS DOUBLE) / CAST(n AS DOUBLE))"
            " * 1000000.0"
            " / (CAST(tc AS DOUBLE) / CAST(tn AS DOUBLE))) AS BIGINT)"
        ).alias("price_index_ppm"),
    )


_PARETO_8020_ORACLE = """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey ASC) AS rk,
         COUNT(*) OVER () AS n,
         SUM(cents) OVER () AS total
  FROM rev
)
SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
       CAST(MAX(n) // 5 AS BIGINT) AS top20_count,
       CAST(SUM(CASE WHEN 5 * rk <= n THEN cents ELSE 0 END) AS BIGINT)
         AS top20_cents,
       CAST(FLOOR(CAST(SUM(CASE WHEN 5 * rk <= n THEN cents ELSE 0 END)
                       AS DOUBLE) * 1000000.0
                  / CAST(MAX(total) AS DOUBLE)) AS BIGINT)
         AS top20_share_ppm
FROM ranked
"""


@register("orders_pareto_8020", _PARETO_8020_ORACLE)
def orders_pareto_8020(spark, sf_dir):
    rev = load(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        xsum_total(cents("o_totalprice")).cast("long").alias("cents")
    )
    w_rk = Window.orderBy(F.desc("cents"), F.asc("o_custkey"))
    w_all = Window.partitionBy()
    ranked = rev.select(
        "cents",
        F.row_number().over(w_rk).alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("cents").over(w_all).alias("total"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.expr("CAST(MAX(n) DIV 5 AS BIGINT)").alias("top20_count"),
        F.sum(F.when(5 * F.col("rk") <= F.col("n"), F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("top20_cents"),
        F.expr(
            "CAST(FLOOR(CAST(SUM(CASE WHEN 5 * rk <= n THEN cents ELSE 0 END)"
            " AS DOUBLE) * 1000000.0"
            " / CAST(MAX(total) AS DOUBLE)) AS BIGINT)"
        ).alias("top20_share_ppm"),
    )


_HHI_ORACLE = """
WITH sp AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2
),
tot AS (
  SELECT l_partkey, SUM(q) AS tq, COUNT(*) AS n_suppliers FROM sp
  GROUP BY l_partkey
),
hhi AS (
  SELECT s.l_partkey, MAX(t.n_suppliers) AS n_suppliers,
         SUM(CAST(FLOOR((CAST(s.q AS DOUBLE) / CAST(t.tq AS DOUBLE))
                        * (CAST(s.q AS DOUBLE) / CAST(t.tq AS DOUBLE))
                        * 1000000000000.0) AS BIGINT)) AS hhi_e12
  FROM sp s JOIN tot t ON t.l_partkey = s.l_partkey
  GROUP BY s.l_partkey
)
SELECT CAST(hhi_e12 // 1000000 // 100000 AS INT) AS hhi_decile,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(MIN(n_suppliers) AS BIGINT) AS min_suppliers,
       CAST(MAX(n_suppliers) AS BIGINT) AS max_suppliers
FROM hhi GROUP BY 1
"""


@register("supply_concentration_hhi", _HHI_ORACLE)
def supply_concentration_hhi(spark, sf_dir):
    """Supplier-concentration Herfindahl index per part, rolled to
    HHI deciles (the procurement-risk report). Summing share²
    DOUBLEs would be order-dependent (the no-float-aggregation
    rule), so each share² is floor-scaled to an integer FIRST
    (×1e12, one fixed-order IEEE expression per term) and the SUM is
    integer — order-free and bit-identical across engines, at the
    cost of ≤1e-12 truncation per term."""
    sp = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(xsum_total(cents("l_quantity")).cast("long").alias("q"))
    )
    tot = sp.groupBy("l_partkey").agg(
        F.sum("q").alias("tq"), F.count(F.lit(1)).alias("n_suppliers")
    )
    hhi = (
        sp.join(tot, "l_partkey")
        .groupBy("l_partkey")
        .agg(
            F.max("n_suppliers").alias("n_suppliers"),
            F.sum(
                F.expr(
                    "CAST(FLOOR((CAST(q AS DOUBLE) / CAST(tq AS DOUBLE))"
                    " * (CAST(q AS DOUBLE) / CAST(tq AS DOUBLE))"
                    " * 1000000000000.0) AS BIGINT)"
                )
            ).alias("hhi_e12"),
        )
        .select(
            "l_partkey",
            "n_suppliers",
            F.expr("hhi_e12 DIV 1000000").alias("hhi_e6"),
        )
    )
    return hhi.groupBy(
        F.expr("CAST(hhi_e6 DIV 100000 AS INT)").alias("hhi_decile")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.min("n_suppliers").cast("bigint").alias("min_suppliers"),
        F.max("n_suppliers").cast("bigint").alias("max_suppliers"),
    )
