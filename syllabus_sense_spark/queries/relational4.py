"""TPC-H-shape queries, batch 4: the three shapes previously out of
scope for lack of a ``partsupp`` table — Q2 (correlated-min
subquery), Q11 (HAVING against a global scalar subquery), Q20
(nested aggregate semi-join) — adapted with ``lineitem`` as the
part↔supplier bridge: the observed supply relation per
``(l_partkey, l_suppkey)`` stands in for ``partsupp``, with unit
cost = Σprice/Σqty and supplied qty = Σqty.

Scale posture: the bridge aggregation shuffles lineitem once on its
natural key; every dimension join broadcasts; the Q2 per-part min is
a window over the already-shuffled partkey (no second shuffle), the
Q11 global total is a 1-row broadcast cross join, and the Q20
per-part average joins on the bridge's own grouping key.

Cross-engine determinism: sums in DECIMAL(18,2) (exact), the single
division surfaced as one IEEE double op on identical inputs —
bit-identical in Spark and DuckDB, so double equality/inequality
against the derived min/avg/total is safe.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2, xsum

# --------------------------------------------------------------------------
# q2 adapted: minimum-cost supplier per part. The classic correlated
# subquery `ps_supplycost = (SELECT min(ps_supplycost) ...)` becomes a
# window-min over the bridge's partkey partition — the bridge is
# already hash-partitioned by (partkey, suppkey) from its groupBy, so
# the window introduces no extra shuffle at scale (AQE coalesces).
# --------------------------------------------------------------------------

_Q2_ORACLE = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS unit_cost
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
)
SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name AS nation,
       CAST(CAST(s.s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS s_acctbal,
       ps.unit_cost
FROM ps
JOIN part p ON p.p_partkey = ps.l_partkey
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_size BETWEEN 1 AND 15
  AND ps.unit_cost = (
    SELECT MIN(ps2.unit_cost) FROM ps ps2 WHERE ps2.l_partkey = ps.l_partkey
  )
"""


@register("q2_min_cost_supplier", _Q2_ORACLE)
def q2_min_cost_supplier(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") >= 1) & (F.col("p_size") <= 15)
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    # The part-size predicate keeps whole partkeys, so it commutes
    # with the per-partkey aggregation and window-min — push it below
    # the bridge shuffle as a broadcast semi-join and only ~30% of
    # lineitem ever shuffles (the oracle filters after; same result).
    keep_parts = F.broadcast(p.select("p_partkey"))
    ps = (
        l.join(keep_parts, l.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            (
                xsum(cents("l_extendedprice"), 2, 18)
                / xsum(cents("l_quantity"), 2, 18)
            ).alias("unit_cost")
        )
    )
    w = Window.partitionBy("l_partkey")
    best = ps.withColumn("min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("min_cost")
    )
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.col("n_name").alias("nation"),
            # double, not raw decimal: the driver's Arrow-level value
            # hash is sensitive to decimal precision metadata, which
            # differs across engines even when values are identical
            # (r03: rows+schema matched, hash didn't).
            dec2("s_acctbal").cast("double").alias("s_acctbal"),
            "unit_cost",
        )
    )


# --------------------------------------------------------------------------
# q11 adapted: "important supply value" — per-part supplied value from
# NATION_1 suppliers, kept only when it exceeds a fraction of the
# national total. The scalar subquery becomes a 1-row broadcast cross
# join; the threshold compare happens in exact decimal on both engines
# (no double rounding in the predicate).
# --------------------------------------------------------------------------

_Q11_ORACLE = """
WITH supply AS (
  SELECT l.l_partkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * CAST(l.l_quantity AS DECIMAL(18,2))) AS value_dec
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_1'
  GROUP BY l.l_partkey
)
SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM supply
WHERE value_dec > (
  SELECT SUM(value_dec) * CAST(0.001 AS DECIMAL(6,4)) FROM supply
)
"""


@register("q11_important_supply_value", _Q11_ORACLE)
def q11_important_supply_value(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    nat_suppliers = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    supply = (
        l.join(F.broadcast(nat_suppliers), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(dec2("l_extendedprice") * dec2("l_quantity")).alias("value_dec"))
    )
    total = supply.agg(
        (F.sum("value_dec") * F.lit(0.001).cast("decimal(6,4)")).alias("threshold")
    )
    return (
        supply.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec") > F.col("threshold"))
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
    )


# --------------------------------------------------------------------------
# q20 adapted: suppliers shipping above-average 1997 volume of Brand#1
# parts — the nested `ps_availqty > 0.5 * (SELECT sum(l_quantity) ...)`
# becomes bridge-qty vs. the per-part mean bridge-qty, then a semi-join
# back to supplier names. Two aggregations share the same grouping key,
# so the per-part average join is co-partitioned with the bridge.
# --------------------------------------------------------------------------

_Q20_ORACLE = """
WITH bridge AS (
  SELECT l.l_partkey, l.l_suppkey,
         SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS qty_dec
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#1'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l.l_partkey, l.l_suppkey
),
per_part AS (
  SELECT l_partkey,
         CAST(SUM(qty_dec) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM bridge GROUP BY l_partkey
)
SELECT DISTINCT s.s_name, n.n_name AS nation
FROM bridge b
JOIN per_part pp ON pp.l_partkey = b.l_partkey
JOIN supplier s ON s.s_suppkey = b.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE CAST(b.qty_dec AS DOUBLE) > pp.avg_qty
"""


@register("q20_excess_volume_suppliers", _Q20_ORACLE)
def q20_excess_volume_suppliers(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    bridge = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec2("l_quantity")).alias("qty_dec"))
    )
    # Per-part average as a window over the bridge, not a self-join:
    # one exchange on l_partkey instead of agg + SMJ back (the plan
    # audit flags the join form).
    wp = Window.partitionBy("l_partkey")
    avg_qty = F.sum("qty_dec").over(wp).cast("double") / F.count(F.lit(1)).over(wp)
    excess = bridge.withColumn("avg_qty", avg_qty).filter(
        F.col("qty_dec").cast("double") > F.col("avg_qty")
    )
    return (
        excess.join(F.broadcast(s), excess.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", F.col("n_name").alias("nation"))
        .distinct()
    )
