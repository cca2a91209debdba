"""pandas-on-Spark window ops + the SQL IDENTIFIER clause — two more
API-surface queries, both exact-integer and fully oracle-checked.

`pandas_api_rolling_weekly`: the pandas-API twin of a SQL window
frame — daily order counts (one map-side-combined groupBy reduces
the corpus to the bounded per-day table first), then a pandas-idiom
``rolling(7, min_periods=1).sum()`` over the date-sorted series.
Counts are integers, so the rolling sum is exact; the DuckDB oracle
is the ROWS 6 PRECEDING window frame. The rolling runs on the
pre-reduced O(|days|) series — the documented bounded-table pattern,
not a data-scale single-partition window.

`sql_identifier_clause`: Spark 4's IDENTIFIER(:param) — SQL-injection
-safe dynamic table names. One parameterized statement counts two
different tables through the same template; the oracle is the plain
UNION of counts. (Completes the parameterized-SQL family:
sql_named_parameters binds VALUES, execute_immediate binds
statements, IDENTIFIER binds NAMES.)

Reference anchor: none ([EXT] engine surface per SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_ROLLING_ORACLE = """
WITH daily AS (
  SELECT o_orderdate AS day, COUNT(*) AS n_orders
  FROM orders GROUP BY o_orderdate
)
SELECT day,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(SUM(n_orders) OVER (ORDER BY day
                                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS rolling_7d
FROM daily
"""


@register("pandas_api_rolling_weekly", _ROLLING_ORACLE)
def pandas_api_rolling_weekly(spark, sf_dir):
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    # Bounded per-day series → pandas API; set the day as a sorted
    # index so rolling() walks calendar order deterministically.
    pdf = daily.pandas_api().set_index("day").sort_index()
    pdf["rolling_7d"] = pdf["n_orders"].rolling(7, min_periods=1).sum()
    return (
        pdf.reset_index()
        .to_spark()
        .select(
            "day",
            F.col("n_orders").cast("long").alias("n_orders"),
            F.col("rolling_7d").cast("long").alias("rolling_7d"),
        )
    )


_IDENTIFIER_ORACLE = """
SELECT 'orders' AS tbl, CAST(COUNT(*) AS BIGINT) AS n FROM orders
UNION ALL
SELECT 'customer' AS tbl, CAST(COUNT(*) AS BIGINT) AS n FROM customer
"""


@register("sql_identifier_clause", _IDENTIFIER_ORACLE)
def sql_identifier_clause(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("_ident_orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("_ident_customer")
    return spark.sql(
        """
        SELECT 'orders' AS tbl, CAST(COUNT(*) AS BIGINT) AS n
        FROM IDENTIFIER(:t1)
        UNION ALL
        SELECT 'customer' AS tbl, CAST(COUNT(*) AS BIGINT) AS n
        FROM IDENTIFIER(:t2)
        """,
        args={"t1": "_ident_orders", "t2": "_ident_customer"},
    )
