"""Spark 4 surfaces, part 7: recursive CTEs, SQL-language functions
(CREATE FUNCTION ... RETURN), and collated comparison — all three are
engine-level SQL features new in Spark 4.x, each certified by a full
DuckDB hash oracle.

- ``sql_recursive_month_spine``: WITH RECURSIVE generates the
  gap-free month calendar between min and max order date (the classic
  date-spine recursion), LEFT JOINed to monthly order counts/revenue.
  The recursion is bounded by the date RANGE (~80 months at any SF),
  not the row count — corpus-size independent.
- ``sql_recursive_custkey_chain``: a data-scale recursive traversal —
  every customer walks its decimal-truncation ancestor chain
  (k -> k DIV 10 -> ... -> 0, a forest, so walks = paths and the
  working set is O(N * depth) with depth <= 1 + log10(max key)).
  Spark DIV truncates and DuckDB // floors; keys are nonnegative so
  the two agree (SCALE.md DIV trap).
- ``sql_create_function_margin``: a SQL-language scalar function
  (CREATE TEMPORARY FUNCTION ... RETURNS BIGINT RETURN <expr>) doing
  the exact integer-cents revenue computation, applied per lineitem
  row and aggregated. Catalyst inlines the body — the plan is the
  same whole-stage-codegen aggregate as writing the expression
  directly (verified via explain), so the abstraction is free at any
  scale.
- ``sql_table_function_price_bands``: a SQL-language TABLE function
  (RETURNS TABLE ... RETURN SELECT) producing the 8-band price
  schedule; orders equi-join it on the computed band id (no range
  join — band = cents DIV width first, then join for the labels).
- ``sql_collation_ci_distinct``: COLLATE UTF8_LCASE — engine-level
  case-insensitive comparison semantics (Spark 4 collation support).
  Distinct-under-collation counted against the case-sensitive count
  on a deterministically case-perturbed key; the DuckDB oracle spells
  the same semantics as lower().

Reference anchor: none of these exist in the reference (a
single-threaded LLM-ETL script) — [EXT] engine surface per
SURVEY.md §2's relational/SQL coverage rows.
"""

from __future__ import annotations

from ..tables import load
from . import register

# ---------------------------------------------------------------------------
# recursive month spine

_SPINE_ORACLE = """
WITH RECURSIVE spine(m) AS (
  SELECT CAST(min(date_trunc('month', CAST(o_orderdate AS DATE))) AS DATE)
  FROM orders
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM spine
  WHERE m < (SELECT CAST(max(date_trunc('month', CAST(o_orderdate AS DATE)))
                     AS DATE) FROM orders)
),
monthly AS (
  SELECT substr(CAST(CAST(date_trunc('month', CAST(o_orderdate AS DATE))
                          AS DATE) AS VARCHAR), 1, 7) AS month,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1
)
SELECT s.month,
       COALESCE(m.n_orders, 0) AS n_orders,
       COALESCE(m.rev_cents, 0) AS rev_cents
FROM (SELECT substr(CAST(m AS VARCHAR), 1, 7) AS month FROM spine) s
LEFT JOIN monthly m ON m.month = s.month
"""


@register("sql_recursive_month_spine", _SPINE_ORACLE)
def sql_recursive_month_spine(spark, sf_dir):
    # Recursion-granularity rule (measured, SCALE.md): every recursive
    # STEP is a full sequential Spark job, so recurse over the COARSE
    # unit (years, ~7 steps) and fan the fine unit (12 months) out
    # inside a step with explode — same result as the per-month
    # recursion, 80 sequential jobs -> 7 (11 s -> ~1 s at any SF).
    # DuckDB (single-process) recurses per month in the oracle; the
    # results are identical.
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
      WITH RECURSIVE years(y) AS (
        SELECT year(min(CAST(o_orderdate AS DATE))) FROM orders
        UNION ALL
        SELECT y + 1 FROM years
        WHERE y < (SELECT year(max(CAST(o_orderdate AS DATE))) FROM orders)
      ),
      bounds AS (
        SELECT substr(CAST(CAST(date_trunc('MONTH',
                 min(CAST(o_orderdate AS DATE))) AS DATE) AS STRING), 1, 7)
                 AS lo,
               substr(CAST(CAST(date_trunc('MONTH',
                 max(CAST(o_orderdate AS DATE))) AS DATE) AS STRING), 1, 7)
                 AS hi
        FROM orders
      ),
      spine AS (
        SELECT concat(CAST(y AS STRING), '-', lpad(CAST(mo AS STRING), 2, '0'))
                 AS month
        FROM years
        LATERAL VIEW explode(sequence(1, 12)) t AS mo
      ),
      monthly AS (
        SELECT substr(CAST(CAST(date_trunc('MONTH', CAST(o_orderdate AS DATE))
                                AS DATE) AS STRING), 1, 7) AS month,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders GROUP BY 1
      )
      SELECT s.month,
             COALESCE(m.n_orders, CAST(0 AS BIGINT)) AS n_orders,
             COALESCE(m.rev_cents, CAST(0 AS BIGINT)) AS rev_cents
      FROM spine s CROSS JOIN bounds b
      LEFT JOIN monthly m ON m.month = s.month
      WHERE s.month >= b.lo AND s.month <= b.hi
    """)


# ---------------------------------------------------------------------------
# recursive ancestor chain (data-scale recursion, forest => no blowup)

_CHAIN_ORACLE = """
WITH RECURSIVE chain(start_key, node, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer
  UNION ALL
  SELECT start_key, node // 10, depth + 1 FROM chain WHERE node > 0
),
anc AS (
  SELECT ch.start_key,
         CAST(MAX(ch.depth) AS BIGINT) AS chain_len,
         CAST(COUNT(c.c_custkey) AS BIGINT) AS n_real_anc,
         CAST(COALESCE(SUM(CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100
                                AS BIGINT)), 0) AS BIGINT) AS anc_bal_cents
  FROM chain ch
  LEFT JOIN customer c ON c.c_custkey = ch.node AND ch.depth > 0
  GROUP BY ch.start_key
)
SELECT start_key AS c_custkey, chain_len, n_real_anc, anc_bal_cents FROM anc
"""


@register("sql_recursive_custkey_chain", _CHAIN_ORACLE)
def sql_recursive_custkey_chain(spark, sf_dir):
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql("""
      WITH RECURSIVE chain(start_key, node, depth) AS (
        SELECT c_custkey, c_custkey, 0 FROM customer
        UNION ALL
        SELECT start_key, node DIV 10, depth + 1 FROM chain WHERE node > 0
      ),
      anc AS (
        SELECT ch.start_key,
               CAST(MAX(ch.depth) AS BIGINT) AS chain_len,
               CAST(COUNT(c.c_custkey) AS BIGINT) AS n_real_anc,
               CAST(COALESCE(SUM(CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100
                                      AS BIGINT)), CAST(0 AS BIGINT))
                    AS BIGINT) AS anc_bal_cents
        FROM chain ch
        LEFT JOIN customer c ON c.c_custkey = ch.node AND ch.depth > 0
        GROUP BY ch.start_key
      )
      SELECT start_key AS c_custkey, chain_len, n_real_anc, anc_bal_cents
      FROM anc
    """)


# ---------------------------------------------------------------------------
# SQL-language scalar function

_FN_MARGIN_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                * (100 - CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)))
            AS BIGINT) AS rev_microcents
FROM lineitem
GROUP BY l_returnflag
"""


@register("sql_create_function_margin", _FN_MARGIN_ORACLE)
def sql_create_function_margin(spark, sf_dir):
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    # SQL-language function: Catalyst inlines the body at plan time,
    # so per-row cost equals the hand-written expression (no UDF).
    spark.sql("""
      CREATE OR REPLACE TEMPORARY FUNCTION revenue_microcents(p DOUBLE, d DOUBLE)
      RETURNS BIGINT
      RETURN CAST(CAST(p AS DECIMAL(18,2)) * 100 AS BIGINT)
             * (100 - CAST(CAST(d AS DECIMAL(4,2)) * 100 AS BIGINT))
    """)
    return spark.sql("""
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(revenue_microcents(l_extendedprice, l_discount))
                  AS BIGINT) AS rev_microcents
      FROM lineitem
      GROUP BY l_returnflag
    """)


# ---------------------------------------------------------------------------
# SQL-language table function

_BAND_WIDTH_CENTS = 10_000_000  # $100k per band
_N_BANDS = 8  # max o_totalprice ~ $600k at every SF (price range is
# SF-independent in TPC-H-style generators), so 8 bands always cover.

_TVF_BANDS_ORACLE = f"""
WITH bands AS (
  SELECT CAST(x AS INT) AS band,
         CAST(x AS BIGINT) * {_BAND_WIDTH_CENTS} AS lo_cents,
         (CAST(x AS BIGINT) + 1) * {_BAND_WIDTH_CENTS} AS hi_cents
  FROM range({_N_BANDS}) t(x)
),
bucketed AS (
  SELECT CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              // {_BAND_WIDTH_CENTS} AS INT) AS band,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
)
SELECT b.band, b.lo_cents, b.hi_cents,
       COALESCE(k.n_orders, 0) AS n_orders
FROM bands b LEFT JOIN bucketed k ON k.band = b.band
"""


@register("sql_table_function_price_bands", _TVF_BANDS_ORACLE)
def sql_table_function_price_bands(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    spark.sql(f"""
      CREATE OR REPLACE TEMPORARY FUNCTION price_bands(n INT, width BIGINT)
      RETURNS TABLE(band INT, lo_cents BIGINT, hi_cents BIGINT)
      RETURN SELECT CAST(x AS INT) AS band,
                    x * width AS lo_cents,
                    (x + 1) * width AS hi_cents
             FROM (SELECT explode(sequence(CAST(0 AS BIGINT),
                                           CAST(n - 1 AS BIGINT))) AS x)
    """)
    return spark.sql(f"""
      WITH bucketed AS (
        SELECT CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                    DIV {_BAND_WIDTH_CENTS} AS INT) AS band,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
      )
      SELECT b.band, b.lo_cents, b.hi_cents,
             COALESCE(k.n_orders, CAST(0 AS BIGINT)) AS n_orders
      FROM price_bands({_N_BANDS}, {_BAND_WIDTH_CENTS}) b
      LEFT JOIN bucketed k ON k.band = b.band
    """)


# ---------------------------------------------------------------------------
# collation

_COLLATION_ORACLE = """
WITH keyed AS (
  SELECT CASE WHEN doc_id % 3 = 0 THEN upper(substr(text, 1, 12))
              ELSE substr(text, 1, 12) END AS k
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT k) AS BIGINT) AS n_keys_cs,
       CAST(COUNT(DISTINCT lower(k)) AS BIGINT) AS n_keys_ci
FROM keyed
"""


@register("sql_collation_ci_distinct", _COLLATION_ORACLE)
def sql_collation_ci_distinct(spark, sf_dir):
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    # UTF8_LCASE: comparison (and therefore DISTINCT) is performed
    # under lowercase mapping INSIDE the engine — no derived column.
    # The oracle spells the same semantics as DISTINCT lower(k).
    return spark.sql("""
      WITH keyed AS (
        SELECT CASE WHEN doc_id % 3 = 0 THEN upper(substr(text, 1, 12))
                    ELSE substr(text, 1, 12) END AS k
        FROM documents
      )
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT k) AS BIGINT) AS n_keys_cs,
             CAST(COUNT(DISTINCT collate(k, 'UTF8_LCASE')) AS BIGINT) AS n_keys_ci
      FROM keyed
    """)
