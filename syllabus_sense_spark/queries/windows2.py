"""Window coverage, batch 2: range-based frames, nth_value,
percent_rank, plus approximate aggregates (rows-only — sketch results
have no exact oracle by construction; their accuracy is asserted in
tests against exact counterparts).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import dec2

# --- RANGE frame: trailing 30-day revenue per customer --------------------
# The frame is value-based (days), not row-based: orders 40 days apart
# do not see each other even if adjacent by row.

_RANGE_FRAME_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day_no,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
)
SELECT
  o_custkey,
  o_orderkey,
  CAST(day_no AS BIGINT) AS day_no,
  CAST(SUM(price) OVER (PARTITION BY o_custkey ORDER BY day_no
                        RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS trailing_30d_spend
FROM o
"""


@register("window_range_frame_30d", _RANGE_FRAME_ORACLE)
def window_range_frame_30d(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    day_no = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
    ).cast("long")
    base = o.select(
        "o_custkey",
        "o_orderkey",
        day_no.alias("day_no"),
        dec2("o_totalprice").alias("price"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_no")
        .rangeBetween(-30, Window.currentRow)
    )
    return base.select(
        "o_custkey",
        "o_orderkey",
        "day_no",
        F.sum("price").over(w).cast("double").alias("trailing_30d_spend"),
    )


_NTH_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  CAST(NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
       ORDER BY o_orderdate, o_orderkey
       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT)
    AS second_orderkey,
  CAST(PERCENT_RANK() OVER (PARTITION BY o_custkey
       ORDER BY o_totalprice, o_orderkey) AS DOUBLE) AS spend_pct_rank
FROM orders
"""


@register("window_nth_percent_rank", _NTH_ORACLE)
def window_nth_percent_rank(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_rank = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_orderkey", 2).over(w_full).cast("long").alias("second_orderkey"),
        F.percent_rank().over(w_rank).cast("double").alias("spend_pct_rank"),
    )


# --- array higher-order functions -----------------------------------------

_HOF_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
  FROM documents WHERE doc_id % 50 = 3
)
SELECT
  doc_id,
  (len(list_filter(toks, x -> length(x) >= 3)) = len(toks)) AS all_len3plus,
  (len(list_filter(toks, x -> x = 'spark')) > 0) AS any_spark,
  CAST(len(list_filter(toks, x -> length(x) > 4)) AS BIGINT) AS n_long_tokens,
  array_to_string(list_transform(list_slice(toks, 1, 4), x -> upper(x)), '-')
    AS first4_upper
FROM t
"""


@register("array_higher_order_fns", _HOF_ORACLE)
def array_higher_order_fns(spark, sf_dir):
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 3)
    t = d.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: F.length(x) > 0).alias("toks"),
    )
    toks = F.col("toks")
    return t.select(
        "doc_id",
        F.forall(toks, lambda x: F.length(x) >= 3).alias("all_len3plus"),
        F.exists(toks, lambda x: x == "spark").alias("any_spark"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).cast("long").alias("n_long_tokens"),
        F.array_join(
            F.transform(F.slice(toks, 1, 4), lambda x: F.upper(x)), "-"
        ).alias("first4_upper"),
    )


# --- approximate aggregates (rows-only; accuracy asserted in tests) -------


@register("agg_approx_sketches")  # rows-only: HLL/KLL sketches are engine-specific
def agg_approx_sketches(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey").alias("approx_buyers"),
        F.percentile_approx("o_totalprice", 0.5, 1000).alias("approx_p50"),
        F.count(F.lit(1)).alias("n_orders"),
    )
