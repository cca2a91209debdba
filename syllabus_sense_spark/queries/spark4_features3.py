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

from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import rotate_checkpoint


def _rot2(df, name):
    """Register this invocation's tiny result checkpoint, releasing
    the previous invocation's (conf-scoped materializations cannot be
    released before return — the caller's action reads them)."""
    return rotate_checkpoint(f"spark4_features3.{name}", df)

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
        out = _rot2(spark.sql(
            f"""EXECUTE IMMEDIATE
            'SELECT o_orderpriority AS priority,
                    CAST(COUNT(*) AS BIGINT) AS n_orders,
                    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                         AS BIGINT) AS cents
             FROM orders_ei_{tag}
             WHERE o_orderstatus = ? AND o_totalprice > ?
             GROUP BY o_orderpriority'
            USING 'O', 50000"""
        ).localCheckpoint(), "sql_execute_immediate_params")
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
        out = _rot2(spark.sql(
            f"""SELECT c_mktsegment AS segment,
                       CAST(COUNT(*) AS BIGINT) AS n_customers
                FROM customer_sv_{tag}
                WHERE c_acctbal > {var}
                GROUP BY c_mktsegment"""
        ).localCheckpoint(), "sql_session_variables")
    finally:
        spark.sql(f"DROP TEMPORARY VARIABLE IF EXISTS {var}")
        spark.catalog.dropTempView(f"customer_sv_{tag}")
    return out


_NAMED_PARAMS_ORACLE = """
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(MIN(p_size) AS INT) AS min_size
FROM part
WHERE p_size BETWEEN 10 AND 30 AND p_retailprice > 1200
GROUP BY p_brand
"""


@register("sql_named_parameters", _NAMED_PARAMS_ORACLE)
def sql_named_parameters(spark, sf_dir):
    """Parameterized `spark.sql(..., args={...})` (SDF-safe named
    parameter markers, Spark 3.4+) — the injection-proof API surface
    notebooks templatize with; distinct from EXECUTE IMMEDIATE's
    SQL-side binding. Value-transparency hash-checked against the
    inlined oracle."""
    import uuid as _uuid

    tag = _uuid.uuid4().hex[:8]
    load(spark, sf_dir, "part").createOrReplaceTempView(f"part_np_{tag}")
    try:
        out = _rot2(spark.sql(
            f"""SELECT p_brand,
                       CAST(COUNT(*) AS BIGINT) AS n_parts,
                       CAST(MIN(p_size) AS INT) AS min_size
                FROM part_np_{tag}
                WHERE p_size BETWEEN :lo AND :hi AND p_retailprice > :minprice
                GROUP BY p_brand""",
            args={"lo": 10, "hi": 30, "minprice": 1200},
        ).localCheckpoint(), "sql_named_parameters")
    finally:
        spark.catalog.dropTempView(f"part_np_{tag}")
    return out


_CROSSTAB_ORACLE = """
SELECT o_orderstatus,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
            AS BIGINT) AS urgent,
       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)
            AS BIGINT) AS high,
       CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END)
            AS BIGINT) AS medium,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN
                     ('1-URGENT', '2-HIGH', '3-MEDIUM') THEN 1 ELSE 0 END)
            AS BIGINT) AS other
FROM orders GROUP BY o_orderstatus
"""


@register("stat_crosstab_status_priority", _CROSSTAB_ORACLE)
def stat_crosstab_status_priority(spark, sf_dir):
    """`df.stat.crosstab` — the contingency-table convenience the
    DataFrameStatFunctions surface exposes; exact counts, so unlike
    freqItems/approxQuantile it hash-checks. Crosstab emits one
    column per distinct value — re-shaped to a FIXED set (urgent /
    high / medium / other) so the output schema is stable under value
    drift at any scale."""
    ct = (
        load(spark, sf_dir, "orders")
        .stat.crosstab("o_orderstatus", "o_orderpriority")
        .withColumnRenamed("o_orderstatus_o_orderpriority", "o_orderstatus")
    )
    known = {"1-URGENT", "2-HIGH", "3-MEDIUM"}
    other_cols = [c for c in ct.columns if c != "o_orderstatus" and c not in known]
    zero = F.lit(0)
    return ct.select(
        "o_orderstatus",
        (F.col("1-URGENT") if "1-URGENT" in ct.columns else zero)
        .cast("bigint")
        .alias("urgent"),
        (F.col("2-HIGH") if "2-HIGH" in ct.columns else zero)
        .cast("bigint")
        .alias("high"),
        (F.col("3-MEDIUM") if "3-MEDIUM" in ct.columns else zero)
        .cast("bigint")
        .alias("medium"),
        (
            sum((F.col(f"`{c}`") for c in other_cols), zero)
            .cast("bigint")
            .alias("other")
        ),
    )


_PIPE_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
GROUP BY l_returnflag
"""


@register("sql_pipe_syntax_rollup", _PIPE_ORACLE)
def sql_pipe_syntax_rollup(spark, sf_dir):
    """SQL pipe syntax (Spark 4.0, `|>` operators) — the
    linear-dataflow SQL dialect: FROM |> WHERE |> AGGREGATE ... GROUP
    BY. Hash-checked against the classical form, certifying the two
    surfaces plan identically."""
    import uuid as _uuid

    tag = _uuid.uuid4().hex[:8]
    load(spark, sf_dir, "lineitem").createOrReplaceTempView(f"li_pipe_{tag}")
    try:
        out = _rot2(spark.sql(
            f"""FROM li_pipe_{tag}
                |> WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_items,
                             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                                  AS DOUBLE) AS total_qty
                   GROUP BY l_returnflag"""
        ).select("l_returnflag", "n_items", "total_qty").localCheckpoint(), "sql_pipe_syntax_rollup")
    finally:
        spark.catalog.dropTempView(f"li_pipe_{tag}")
    return out


_UNPIVOT_SQL_ORACLE = """
WITH wide AS (
  SELECT c_nationkey,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_positive,
         CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_negative
  FROM customer GROUP BY c_nationkey
)
SELECT c_nationkey, 'n_customers' AS metric, n_customers AS value FROM wide
UNION ALL
SELECT c_nationkey, 'n_positive', n_positive FROM wide
UNION ALL
SELECT c_nationkey, 'n_negative', n_negative FROM wide
"""


@register("sql_unpivot_form", _UNPIVOT_SQL_ORACLE)
def sql_unpivot_form(spark, sf_dir):
    """The SQL `UNPIVOT` clause (vs the DataFrame `unpivot` API that
    `unpivot_nation_metrics` certifies) — the ANSI long-form reshaping
    BI queries use."""
    import uuid as _uuid

    tag = _uuid.uuid4().hex[:8]
    load(spark, sf_dir, "customer").createOrReplaceTempView(f"cust_up_{tag}")
    try:
        out = _rot2(spark.sql(
            f"""SELECT c_nationkey, metric, value FROM (
                  SELECT c_nationkey,
                         CAST(COUNT(*) AS BIGINT) AS n_customers,
                         CAST(SUM(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END)
                              AS BIGINT) AS n_positive,
                         CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)
                              AS BIGINT) AS n_negative
                  FROM cust_up_{tag} GROUP BY c_nationkey
                ) UNPIVOT (
                  value FOR metric IN (n_customers, n_positive, n_negative)
                )"""
        ).localCheckpoint(), "sql_unpivot_form")
    finally:
        spark.catalog.dropTempView(f"cust_up_{tag}")
    return out
