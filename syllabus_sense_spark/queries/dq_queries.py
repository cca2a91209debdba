"""Data-quality gate queries over the expectations operator
(operators/expectations.py): the whole rule list evaluates in ONE
aggregate pass and unpivots to the tidy (rule, n_violations, passed)
gate table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.expectations import (
    expect_accepted_values,
    expect_in_range,
    expect_matches,
    expect_not_null,
    expect_unique,
    run_expectations,
)
from ..tables import load
from . import register

_DQ_ORACLE = """
WITH agg AS (
  SELECT
    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c0,
    CAST(COUNT(*) - COUNT(DISTINCT CAST(o_orderkey AS VARCHAR)) AS BIGINT) AS c1,
    CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                    OR o_totalprice > 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
    CAST(SUM(CASE WHEN o_orderstatus IS NULL
                    OR o_orderstatus NOT IN ('P', 'O', 'F')
               THEN 1 ELSE 0 END) AS BIGINT) AS c3,
    CAST(SUM(CASE WHEN o_orderpriority IS NULL
                    OR NOT regexp_matches(o_orderpriority, '^[1-5]-')
               THEN 1 ELSE 0 END) AS BIGINT) AS c4
  FROM orders
)
SELECT 'not_null:o_custkey' AS rule, c0 AS n_violations, c0 = 0 AS passed FROM agg
UNION ALL SELECT 'unique:o_orderkey', c1, c1 = 0 FROM agg
UNION ALL SELECT 'in_range:o_totalprice', c2, c2 = 0 FROM agg
UNION ALL SELECT 'accepted_values:o_orderstatus', c3, c3 = 0 FROM agg
UNION ALL SELECT 'matches:o_orderpriority', c4, c4 = 0 FROM agg
"""


@register("dq_check_orders", _DQ_ORACLE)
def dq_check_orders(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return run_expectations(
        o,
        [
            expect_not_null("o_custkey"),
            expect_unique("o_orderkey"),
            expect_in_range("o_totalprice", 0, 1000000),
            expect_accepted_values("o_orderstatus", ("P", "O", "F")),
            expect_matches("o_orderpriority", "^[1-5]-"),
        ],
    )


# --------------------------------------------------------------------------
# Referential-integrity gate: orphan counts for every foreign key in
# the star schema. Each check is a left-anti join against the parent
# key set — dimension parents broadcast (their key columns are tiny at
# any realistic cardinality), the lineitem→orders check shuffles on
# the natural join key and AQE handles the rest. A violation count of
# zero per FK is the pass condition, same contract as dq_check_orders.
# --------------------------------------------------------------------------

# NOT EXISTS, not NOT IN: a NULL FK value makes NOT IN three-valued
# (the row silently drops out) while the Spark side's left_anti join
# counts it as an orphan — NOT EXISTS matches left_anti exactly, so
# the oracle agrees with the gate precisely when dirty (NULL-key)
# data appears, which is what a DQ gate exists to catch.
_FK_ORACLE = """
SELECT 'orders.o_custkey -> customer' AS fk,
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey))
            AS BIGINT) AS n_orphans,
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) = 0 AS passed
UNION ALL
SELECT 'lineitem.l_orderkey -> orders',
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
            AS BIGINT),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)) = 0
UNION ALL
SELECT 'lineitem.l_partkey -> part',
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM part p
                               WHERE p.p_partkey = l.l_partkey))
            AS BIGINT),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p
                          WHERE p.p_partkey = l.l_partkey)) = 0
UNION ALL
SELECT 'lineitem.l_suppkey -> supplier',
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM supplier s
                               WHERE s.s_suppkey = l.l_suppkey))
            AS BIGINT),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM supplier s
                          WHERE s.s_suppkey = l.l_suppkey)) = 0
"""


@register("dq_check_fk_integrity", _FK_ORACLE)
def dq_check_fk_integrity(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    checks = [
        (
            "orders.o_custkey -> customer",
            o.join(
                F.broadcast(load(spark, sf_dir, "customer").select("c_custkey")),
                o.o_custkey == F.col("c_custkey"),
                "left_anti",
            ),
        ),
        (
            "lineitem.l_orderkey -> orders",
            l.join(
                o.select("o_orderkey"),
                l.l_orderkey == F.col("o_orderkey"),
                "left_anti",
            ),
        ),
        (
            "lineitem.l_partkey -> part",
            l.join(
                F.broadcast(load(spark, sf_dir, "part").select("p_partkey")),
                l.l_partkey == F.col("p_partkey"),
                "left_anti",
            ),
        ),
        (
            "lineitem.l_suppkey -> supplier",
            l.join(
                F.broadcast(load(spark, sf_dir, "supplier").select("s_suppkey")),
                l.l_suppkey == F.col("s_suppkey"),
                "left_anti",
            ),
        ),
    ]
    out = None
    for fk_name, orphans in checks:
        row = orphans.agg(F.count(F.lit(1)).alias("n_orphans")).select(
            F.lit(fk_name).alias("fk"),
            F.col("n_orphans"),
            (F.col("n_orphans") == 0).alias("passed"),
        )
        out = row if out is None else out.unionByName(row)
    return out


