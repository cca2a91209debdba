"""Scalar-function batch 6: the MAP higher-order family —
map_from_entries, transform_values, map_filter, map_zip_with, and
map_entries — composed into one certified pipeline. Maps are complex
types the value hash can't compare directly (repo rule: complex
outputs only in rows-only queries), so the pipeline ends by exploding
entries back to plain rows and aggregating exact integers; the DuckDB
oracle computes the same arithmetic relationally, which pins the
SEMANTICS of each map operator (key alignment in map_zip_with, the
filter predicate, the value transform) without needing map equality.

Per order row:
- charges = map_from_entries([('base', cents), ('tax', cents*7 DIV
  100), ('ship', cents DIV 50)]) — the keyed fee breakdown shape;
- rates  = map('base'->100, 'tax'->107, 'ship'->102) (constant);
- adjusted = map_zip_with(charges, rates, (k, c, r) -> c * r DIV 100)
  — key-aligned combination;
- big = map_filter(adjusted, (k, v) -> v >= 500000) — drop small fees;
- explode map_entries(big) and aggregate per fee kind.

Scale: all per-row expression work inside whole-stage codegen; one
aggregate shuffle on the 3-value fee-kind key at the end.

Reference anchor: none (engine map-function surface per SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents

_MAP_HOF_ORACLE = """
WITH cents AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM orders
),
fees AS (
  SELECT 'base' AS fee, (c * 100) // 100 AS v FROM cents
  UNION ALL
  SELECT 'tax' AS fee, ((c * 7) // 100 * 107) // 100 AS v FROM cents
  UNION ALL
  SELECT 'ship' AS fee, ((c // 50) * 102) // 100 AS v FROM cents
)
SELECT fee,
       CAST(COUNT(*) AS BIGINT) AS n_fees,
       CAST(SUM(v) AS BIGINT) AS total_cents
FROM fees
WHERE v >= 500000
GROUP BY fee
"""


@register("map_higher_order_pipeline", _MAP_HOF_ORACLE)
def map_higher_order_pipeline(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c_total = cents("o_totalprice")
    expr = (
        "map_entries(map_filter(map_zip_with("
        "  map_from_entries(array("
        "    struct('base' AS k, c AS v),"
        "    struct('tax' AS k, (c * 7) DIV 100 AS v),"
        "    struct('ship' AS k, c DIV 50 AS v))),"
        "  map('base', 100L, 'tax', 107L, 'ship', 102L),"
        "  (k, chg, r) -> (chg * r) DIV 100),"
        "(k, v) -> v >= 500000))"
    )
    return (
        o.select(c_total.alias("c"))
        .select(F.explode(F.expr(expr)).alias("e"))
        .select(F.col("e.key").alias("fee"), F.col("e.value").alias("v"))
        .groupBy("fee")
        .agg(
            F.count(F.lit(1)).alias("n_fees"),
            F.sum("v").cast("bigint").alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# embedded-CSV parse (from_csv / to_csv)

_CSV_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_roundtrip_ok,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS cents
FROM orders
GROUP BY o_orderstatus
"""


@register("scalar_csv_roundtrip", _CSV_ORACLE)
def scalar_csv_roundtrip(spark, sf_dir):
    """Embedded-CSV columns: to_csv(struct) -> from_csv(schema) round
    trip — the 'CSV line inside a string column' ingestion surface.
    The oracle aggregates the ORIGINAL columns; the Spark side
    aggregates the PARSED ones and counts field-exact round trips, so
    a quoting/typing bug in either direction breaks the hash (cents
    differ or n_roundtrip_ok < n_rows)."""
    o = load(spark, sf_dir, "orders")
    line = F.to_csv(
        F.struct(
            F.col("o_orderkey"),
            F.col("o_orderstatus"),
            cents("o_totalprice")
            .alias("cents"),
        )
    )
    parsed = o.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", line.alias("line")
    ).withColumn(
        "p",
        F.from_csv(
            F.col("line"), "o_orderkey BIGINT, o_orderstatus STRING, cents BIGINT"
        ),
    )
    ok = (
        (F.col("p.o_orderkey") == F.col("o_orderkey"))
        & (F.col("p.o_orderstatus") == F.col("o_orderstatus"))
        & (
            F.col("p.cents")
            == cents("o_totalprice")
        )
    )
    return parsed.groupBy(F.col("p.o_orderstatus").alias("o_orderstatus")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(ok, 1).otherwise(0)).cast("bigint").alias("n_roundtrip_ok"),
        F.sum("p.cents").cast("bigint").alias("cents"),
    )
