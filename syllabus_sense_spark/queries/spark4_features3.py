"""Spark 4 SQL surfaces batch 3 — parameterized execution:
`EXECUTE IMMEDIATE` with positional parameters and SQL session
variables (`DECLARE VARIABLE` / `SET VAR`) driving a query. These are
the SQL-2016 dynamic-SQL surfaces BI tools and notebook templates
compile to; certifying them means a reference user's parameterized
dashboards port unchanged.

The oracle is the same query with the parameter values inlined —
parameter binding must be value-transparent, which is exactly the
property being certified.
"""

from __future__ import annotations

import uuid

from ..tables import load
from . import register

_EXEC_IMMEDIATE_ORACLE = """
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
         AS cents
FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice > 50000
GROUP BY o_orderpriority
"""


@register("sql_execute_immediate_params", _EXEC_IMMEDIATE_ORACLE)
def sql_execute_immediate_params(spark, sf_dir):
    tag = uuid.uuid4().hex[:8]
    load(spark, sf_dir, "orders").createOrReplaceTempView(f"orders_ei_{tag}")
    try:
        out = spark.sql(
            f"""EXECUTE IMMEDIATE
            'SELECT o_orderpriority AS priority,
                    CAST(COUNT(*) AS BIGINT) AS n_orders,
                    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                         AS BIGINT) AS cents
             FROM orders_ei_{tag}
             WHERE o_orderstatus = ? AND o_totalprice > ?
             GROUP BY o_orderpriority'
            USING 'O', 50000"""
        ).localCheckpoint()
    finally:
        spark.catalog.dropTempView(f"orders_ei_{tag}")
    return out


_SESSION_VAR_ORACLE = """
SELECT c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
WHERE c_acctbal > 1000
GROUP BY c_mktsegment
"""


@register("sql_session_variables", _SESSION_VAR_ORACLE)
def sql_session_variables(spark, sf_dir):
    tag = uuid.uuid4().hex[:8]
    load(spark, sf_dir, "customer").createOrReplaceTempView(
        f"customer_sv_{tag}"
    )
    var = f"min_bal_{tag}"
    try:
        spark.sql(f"DECLARE VARIABLE {var} DOUBLE DEFAULT 0.0")
        spark.sql(f"SET VAR {var} = 1000")
        out = spark.sql(
            f"""SELECT c_mktsegment AS segment,
                       CAST(COUNT(*) AS BIGINT) AS n_customers
                FROM customer_sv_{tag}
                WHERE c_acctbal > {var}
                GROUP BY c_mktsegment"""
        ).localCheckpoint()
    finally:
        spark.sql(f"DROP TEMPORARY VARIABLE IF EXISTS {var}")
        spark.catalog.dropTempView(f"customer_sv_{tag}")
    return out
