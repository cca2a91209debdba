"""Scalar/function coverage, batch 2: maps, structs, JSON round-trip,
date arithmetic, null-handling functions, union-by-name with missing
columns, positional explode.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

# --- map functions ---------------------------------------------------------

_MAP_ORACLE = """
SELECT
  doc_id,
  MAP {'lang': lang, 'source': source}['lang'][1] AS lang_from_map,
  CAST(cardinality(MAP {'lang': lang, 'source': source}) AS INTEGER) AS map_size,
  array_to_string(map_keys(MAP {'lang': lang, 'source': source}), ',') AS keys_csv
FROM documents
WHERE doc_id % 20 = 0
"""


@register("map_functions", _MAP_ORACLE)
def map_functions(spark, sf_dir):
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return d.select(
        "doc_id",
        F.element_at(m, "lang").alias("lang_from_map"),
        F.size(m).alias("map_size"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )


# --- struct pack/unpack ----------------------------------------------------

_STRUCT_ORACLE = """
SELECT
  doc_id,
  (struct_pack(l := lang, n := n_chars)).l AS lang_out,
  (struct_pack(l := lang, n := n_chars)).n AS n_out
FROM documents
WHERE doc_id % 25 = 0
"""


@register("struct_functions", _STRUCT_ORACLE)
def struct_functions(spark, sf_dir):
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    s = F.struct(F.col("lang").alias("l"), F.col("n_chars").alias("n"))
    return d.select(
        "doc_id",
        s.getField("l").alias("lang_out"),
        s.getField("n").alias("n_out"),
    )


# --- JSON round-trip: build → serialize → parse back ----------------------

_JSON_RT_ORACLE = """
SELECT
  event_id,
  to_json(struct_pack(t := event_type, k := CAST(json_extract_string(props, '$.k') AS BIGINT)))
    AS packed,
  CAST(json_extract_string(
         to_json(struct_pack(t := event_type, k := CAST(json_extract_string(props, '$.k') AS BIGINT))),
         '$.k') AS BIGINT) AS k_roundtrip
FROM events
WHERE event_id % 100 = 0
"""


@register("json_roundtrip", _JSON_RT_ORACLE)
def json_roundtrip(spark, sf_dir):
    e = load(spark, sf_dir, "events").filter(F.col("event_id") % 100 == 0)
    packed = F.to_json(
        F.struct(
            F.col("event_type").alias("t"),
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
    )
    return e.select(
        "event_id",
        packed.alias("packed"),
        F.get_json_object(packed, "$.k").cast("long").alias("k_roundtrip"),
    )


# --- date arithmetic -------------------------------------------------------

_DATE_ARITH_ORACLE = """
SELECT
  o_orderkey,
  CAST(o_orderdate AS DATE) AS order_day,
  CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS plus_month,
  CAST(o_orderdate AS DATE) + 30 AS plus_30d,
  last_day(o_orderdate) AS month_end,
  CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
  CAST(dayofweek(o_orderdate) AS INTEGER) + 1 AS dow
FROM orders
WHERE o_orderkey % 100 = 0
"""


@register("date_arithmetic", _DATE_ARITH_ORACLE)
def date_arithmetic(spark, sf_dir):
    # dayofweek: DuckDB 0=Sunday..6; Spark 1=Sunday..7 — the +1 in the
    # oracle aligns them. plus_30d uses DATE+int on the DuckDB side:
    # DuckDB 1.0.0 CSE merges two different INTERVAL literals in one
    # SELECT (1 MONTH and 30 DAY collapse to one), so only one
    # interval expression may appear per statement.
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_day"),
        F.add_months(F.col("o_orderdate"), 1).alias("plus_month"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus_30d"),
        F.last_day(F.col("o_orderdate")).alias("month_end"),
        F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("week_start"),
        F.dayofweek(F.col("o_orderdate")).alias("dow"),
    )


# --- null-handling functions ----------------------------------------------

_NULLS_ORACLE = """
WITH lastord AS (
  SELECT o_custkey, MAX(o_orderdate) AS last_order
  FROM orders GROUP BY o_custkey
)
SELECT
  c.c_custkey,
  (l.o_custkey IS NOT NULL) AS has_orders,
  COALESCE(CAST(year(l.last_order) AS BIGINT), -1) AS last_year_or_neg1,
  NULLIF(c.c_mktsegment, 'BUILDING') AS segment_or_null,
  (CAST(year(l.last_order) AS BIGINT) IS NOT DISTINCT FROM 2001) AS nullsafe_is_2001
FROM customer c
LEFT JOIN lastord l ON c.c_custkey = l.o_custkey
"""


@register("null_handling_functions", _NULLS_ORACLE)
def null_handling_functions(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    lastord = o.groupBy("o_custkey").agg(F.max("o_orderdate").alias("last_order"))
    j = c.join(lastord, c.c_custkey == lastord.o_custkey, "left")
    last_year = F.year("last_order").cast("long")
    return j.select(
        "c_custkey",
        F.col("o_custkey").isNotNull().alias("has_orders"),
        F.coalesce(last_year, F.lit(-1)).alias("last_year_or_neg1"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("segment_or_null"),
        last_year.eqNullSafe(F.lit(2001)).alias("nullsafe_is_2001"),
    )


# --- union by name with missing columns -----------------------------------

_UNION_NAME_ORACLE = """
SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 50 = 0
UNION ALL BY NAME
SELECT doc_id, lang FROM documents WHERE doc_id % 50 = 1
"""


@register("union_by_name_missing", _UNION_NAME_ORACLE)
def union_by_name_missing(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    a = d.filter(F.col("doc_id") % 50 == 0).select("doc_id", "lang", "n_chars")
    b = d.filter(F.col("doc_id") % 50 == 1).select("doc_id", "lang")
    return a.unionByName(b, allowMissingColumns=True)


# --- positional explode ----------------------------------------------------

_POSEXPLODE_ORACLE = """
SELECT
  doc_id,
  CAST(unnest(range(len(string_split(text, ' ')))) AS BIGINT) AS pos,
  unnest(string_split(text, ' ')) AS tok
FROM documents
WHERE doc_id % 100 = 0
"""


@register("array_posexplode_tokens", _POSEXPLODE_ORACLE)
def array_posexplode_tokens(spark, sf_dir):
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 100 == 0)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")


# --- error-safe (try_*) arithmetic ----------------------------------------
# ANSI-mode-safe arithmetic: try_divide / try_cast return null instead
# of raising, the posture a long-running pipeline wants for dirty
# numeric columns. DuckDB mirrors with NULLIF-guarded division and
# TRY_CAST, so the nulls line up row-for-row.

_TRY_FNS_ORACLE = """
SELECT
  o_orderkey,
  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
    / NULLIF(CAST(o_orderkey % 3 AS DOUBLE), 0) AS safe_ratio,
  TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
  TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit
FROM orders
WHERE o_orderkey % 20 = 0
"""


@register("try_functions_safe_arith", _TRY_FNS_ORACLE)
def try_functions_safe_arith(spark, sf_dir):
    from ._util import dec2

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    return o.select(
        "o_orderkey",
        F.try_divide(
            dec2("o_totalprice").cast("double"),
            (F.col("o_orderkey") % 3).cast("double"),
        ).alias("safe_ratio"),
        F.col("o_orderpriority").try_cast("int").alias("bad_cast"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_digit"),
    )
