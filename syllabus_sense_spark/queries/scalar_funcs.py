"""Scalar function families (SURVEY.md §2 Table B: string, date/time,
math, array, JSON) — all JVM-side built-ins inside whole-stage
codegen; no Python in any of these paths.

Reference parity: trim/contains/strip (syllabus_parser.py:61,85-93),
json round-trips (syllabus_ai_graph.py:71,127,253), array
slice/size/flatten (document_parser/data_types.py:113-118).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_STRING_ORACLE = r"""
SELECT
  doc_id,
  upper(lang) AS lang_uc,
  length(text) AS text_len,
  CAST(length(trim(text)) AS BIGINT) AS trimmed_len,
  substr(text, 1, 20) AS prefix20,
  replace(source, 'src', 'source_') AS source_renamed,
  CASE WHEN contains(text, 'spark') THEN 'has_spark' ELSE 'no_spark' END AS spark_flag,
  regexp_extract(source, '([0-9]+)', 1) AS source_num,
  concat_ws('|', lang, source) AS lang_source
FROM documents
WHERE source LIKE 'src1%'
"""


@register("string_functions", _STRING_ORACLE)
def string_functions(spark, sf_dir):
    d = load(spark, sf_dir, "documents").filter(F.col("source").like("src1%"))
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_uc"),
        F.length("text").cast("long").alias("text_len"),
        F.length(F.trim(F.col("text"))).cast("long").alias("trimmed_len"),
        F.substring("text", 1, 20).alias("prefix20"),
        F.replace(F.col("source"), F.lit("src"), F.lit("source_")).alias(
            "source_renamed"
        ),
        F.when(F.contains(F.col("text"), F.lit("spark")), F.lit("has_spark"))
        .otherwise(F.lit("no_spark"))
        .alias("spark_flag"),
        F.regexp_extract("source", "([0-9]+)", 1).alias("source_num"),
        F.concat_ws("|", "lang", "source").alias("lang_source"),
    )


_DATE_ORACLE = """
SELECT
  CAST(year(o_orderdate) AS BIGINT) AS order_year,
  CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
  COUNT(*) AS n_orders,
  CAST(MIN(CAST(o_orderdate AS DATE)) AS DATE) AS first_day,
  CAST(MAX(CAST(o_orderdate AS DATE)) AS DATE) AS last_day,
  CAST(date_diff('day', MIN(CAST(o_orderdate AS DATE)), MAX(CAST(o_orderdate AS DATE))) AS BIGINT)
    AS day_span
FROM orders
GROUP BY 1, 2, 3
"""


@register("datetime_functions", _DATE_ORACLE)
def datetime_functions(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.quarter("o_orderdate").cast("long").alias("order_quarter"),
            F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(F.col("o_orderdate").cast("date")).alias("first_day"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
        )
        .withColumn(
            "day_span",
            F.datediff(F.col("last_day"), F.col("first_day")).cast("long"),
        )
    )


_MATH_ORACLE = """
SELECT
  l_linenumber,
  COUNT(*) AS n,
  CAST(SUM(CAST(round(l_extendedprice, 0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_rounded,
  CAST(SUM(CAST(floor(l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_disc_pct,
  CAST(MAX(abs(l_extendedprice - 50000)) AS DOUBLE) AS max_abs_dev,
  CAST(MIN(least(l_quantity, 25.0)) AS DOUBLE) AS min_capped,
  CAST(MAX(greatest(l_quantity, 25.0)) AS DOUBLE) AS max_floored
FROM lineitem
GROUP BY l_linenumber
"""


@register("math_functions", _MATH_ORACLE)
def math_functions(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_linenumber").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round("l_extendedprice", 0).cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_rounded"),
        F.sum(F.floor(F.col("l_discount") * 100).cast("long"))
        .cast("long")
        .alias("sum_disc_pct"),
        F.max(F.abs(F.col("l_extendedprice") - 50000)).cast("double").alias("max_abs_dev"),
        F.min(F.least(F.col("l_quantity"), F.lit(25.0))).cast("double").alias("min_capped"),
        F.max(F.greatest(F.col("l_quantity"), F.lit(25.0))).cast("double").alias("max_floored"),
    )


_ARRAY_ORACLE = """
WITH toks AS (
  SELECT t.tok
  FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
  WHERE length(t.tok) > 0
)
SELECT tok, COUNT(*) AS n_occurrences
FROM toks
GROUP BY tok
ORDER BY n_occurrences DESC, tok
LIMIT 30
"""


@register("array_explode_token_counts", _ARRAY_ORACLE)
def array_explode_token_counts(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.length("tok") > 0)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("tok"))
        .limit(30)
    )


_ARRAY_OPS_ORACLE = """
SELECT
  doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS first3,
  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique_tokens,
  CASE WHEN list_contains(string_split(text, ' '), 'spark') THEN TRUE ELSE FALSE END
    AS has_spark_token
FROM documents
WHERE doc_id % 10 = 0
"""


@register("array_ops_slice_distinct", _ARRAY_OPS_ORACLE)
def array_ops_slice_distinct(spark, sf_dir):
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
        F.array_contains(toks, "spark").alias("has_spark_token"),
    )


_JSON_ORACLE = """
SELECT
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
"""


@register("json_extract_props", _JSON_ORACLE)
def json_extract_props(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).cast("long").alias("sum_k"),
        F.min(k).cast("long").alias("min_k"),
        F.max(k).cast("long").alias("max_k"),
    )
