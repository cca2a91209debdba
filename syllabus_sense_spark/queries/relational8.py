"""Entity-centric composites: substitution candidates on blocking
keys and the supplier scorecard — the "golden record" reports a
procurement system derives from the same star schema.

`part_substitution_candidates`: parts interchangeable for purchasing
— same (type, size) block, different brand, prices within 10%. The
equi-join on the block key is the blocking-key discipline of
`match_fuzzy_parts` with a numeric tolerance instead of an edit
distance; the price band is the integer cross-multiply
(10·|pa−pb| ≤ pb in cents — no division, no floats).

`supplier_scorecard`: per-supplier volume, revenue, ship-lag p50 and
return rate — four metrics, ONE pass over lineitem (conditional
aggregation; the per-order lag needs orders joined once on the
orderkey). Exact cents / integer days / integer ppm.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2, epoch_us

_US_PER_DAY = 86_400_000_000

_SUBST_ORACLE = """
WITH p AS (
  SELECT p_partkey, p_brand, p_type, p_size,
         CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM part
)
SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
       a.p_type AS p_type, CAST(a.p_size AS INT) AS p_size,
       a.cents AS cents_a, b.cents AS cents_b
FROM p a JOIN p b
  ON a.p_type = b.p_type AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
WHERE a.p_brand <> b.p_brand
  AND 10 * ABS(a.cents - b.cents) <= b.cents
"""


@register("part_substitution_candidates", _SUBST_ORACLE)
def part_substitution_candidates(spark, sf_dir):
    # Spread the block table over the cores BY THE BLOCK KEY before
    # the self-join (match_fuzzy_parts' r10 sweep lesson, same 1-split
    # part table: 26 s / 53x per decade at sf1 on one core; ~1 s
    # spread). The repartition is the plan's only shuffle — both join
    # sides derive from it co-partitioned.
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_type",
        "p_size",
        cents("p_retailprice").alias("cents"),
    ).repartition(
        spark.sparkContext.defaultParallelism, "p_type", "p_size"
    )
    a = p.alias("a")
    b = p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_type") == F.col("b.p_type"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter(
            (F.col("a.p_brand") != F.col("b.p_brand"))
            & (
                10 * F.abs(F.col("a.cents") - F.col("b.cents"))
                <= F.col("b.cents")
            )
        )
        .select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            F.col("a.p_type").alias("p_type"),
            F.col("a.p_size").cast("int").alias("p_size"),
            F.col("a.cents").alias("cents_a"),
            F.col("b.cents").alias("cents_b"),
        )
    )


_SCORECARD_ORACLE = f"""
WITH li AS (
  SELECT l.l_suppkey,
         CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents,
         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS returned,
         CASE WHEN epoch_us(l.l_shipdate) >= epoch_us(o.o_orderdate)
              THEN (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
                   // {_US_PER_DAY}
              ELSE -((epoch_us(o.o_orderdate) - epoch_us(l.l_shipdate)
                      + {_US_PER_DAY} - 1) // {_US_PER_DAY})
         END AS lag_days
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(li.cents) AS BIGINT) AS revenue_cents,
       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY li.lag_days)
            AS BIGINT) AS p50_lag_days,
       CAST(SUM(li.returned) AS BIGINT) * 1000000 // COUNT(*)
         AS return_ppm
FROM li JOIN supplier s ON s.s_suppkey = li.l_suppkey
GROUP BY s.s_suppkey, s.s_name
"""


@register("supplier_scorecard", _SCORECARD_ORACLE)
def supplier_scorecard(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", epoch_us(F.col("o_orderdate")).alias("ous")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_suppkey",
            cents("l_extendedprice").alias("cents"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias(
                "returned"
            ),
            epoch_us(F.col("l_shipdate")).alias("lus"),
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_suppkey",
            "cents",
            "returned",
            F.expr(
                f"CASE WHEN lus >= ous THEN (lus - ous) DIV {_US_PER_DAY}"
                f" ELSE -((ous - lus + {_US_PER_DAY} - 1) DIV {_US_PER_DAY})"
                f" END"
            ).alias("lag_days"),
        )
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY lag_days)")
            .cast("bigint")
            .alias("p50_lag_days"),
            F.expr(
                "CAST(SUM(returned) AS BIGINT) * 1000000 DIV COUNT(*)"
            ).alias("return_ppm"),
        )
    )
