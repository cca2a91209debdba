"""Data-quality gate queries over the expectations operator
(operators/expectations.py): the whole rule list evaluates in ONE
aggregate pass and unpivots to the tidy (rule, n_violations, passed)
gate table.
"""

from __future__ import annotations

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
