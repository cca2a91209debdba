"""Scalar-function batch 5: edit distance, base64 round trip, printf
formatting, and the generator family (stack / inline) — engine
surfaces with exact cross-engine semantics (levenshtein is an integer
metric, base64 is a bijection, printf with %s/%05d/%x is C-style in
both engines).

Reference anchor: none (engine scalar surface per SURVEY.md §2's
string-function rows).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_LEV_ORACLE = """
WITH p AS (
  SELECT doc_id, substr(text, 1, 10) AS prefix FROM documents
),
pairs AS (
  SELECT a.doc_id,
         levenshtein(a.prefix, b.prefix) AS dist
  FROM p a JOIN p b ON b.doc_id = a.doc_id + 1
)
SELECT CAST(dist AS BIGINT) AS dist,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs
GROUP BY dist
"""


@register("scalar_levenshtein_bands", _LEV_ORACLE)
def scalar_levenshtein_bands(spark, sf_dir):
    """Edit-distance histogram between consecutive documents' prefixes
    — levenshtein is the classic DP integer metric, identical in both
    engines (the fuzzy-match primitive; the blocked entity-resolution
    recipe lives in ext_match). The self-join is a slim equi-join on
    doc_id+1, not a cross join."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 10).alias("prefix")
    )
    a = d.alias("a")
    b = d.select((F.col("doc_id") - 1).alias("join_id"), F.col("prefix").alias("bp"))
    return (
        a.join(b, F.col("a.doc_id") == F.col("join_id"))
        .select(F.levenshtein(F.col("a.prefix"), F.col("bp")).alias("dist"))
        .groupBy(F.col("dist").cast("long").alias("dist"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


_B64_ORACLE = """
WITH enc AS (
  SELECT doc_id,
         substr(text, 1, 15) AS raw,
         to_base64(encode(substr(text, 1, 15))) AS b64
  FROM documents
)
SELECT CAST(length(b64) AS BIGINT) AS b64_len,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN decode(from_base64(b64)) = raw THEN 1 ELSE 0 END)
            AS BIGINT) AS n_roundtrip_ok
FROM enc
GROUP BY b64_len
"""


@register("scalar_base64_roundtrip", _B64_ORACLE)
def scalar_base64_roundtrip(spark, sf_dir):
    """base64/unbase64 round trip over document prefixes — the binary
    <-> text bridging every wire format leans on; the decode-equals-raw
    count certifies the bijection, the length histogram the padding."""
    d = load(spark, sf_dir, "documents").select(
        F.substring("text", 1, 15).alias("raw")
    )
    enc = d.select(
        "raw", F.base64(F.col("raw").cast("binary")).alias("b64")
    )
    return enc.select(
        F.length("b64").cast("long").alias("b64_len"),
        F.when(
            F.unbase64(F.col("b64")).cast("string") == F.col("raw"), 1
        )
        .otherwise(0)
        .alias("ok"),
    ).groupBy("b64_len").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ok").cast("bigint").alias("n_roundtrip_ok"),
    )


_PRINTF_ORACLE = """
SELECT printf('%s|%03d|%x',
              o_orderstatus,
              CAST(o_orderkey % 500 AS BIGINT),
              CAST(o_custkey % 16 AS BIGINT)) AS tag,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY tag
HAVING COUNT(*) >= 2
"""


@register("scalar_printf_format", _PRINTF_ORACLE)
def scalar_printf_format(spark, sf_dir):
    """C-style format_string (%s, zero-padded %05d, hex %x) — the
    deterministic key-minting idiom for export filenames/partition
    tags; both engines implement C printf semantics."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            F.format_string(
                "%s|%03d|%x",
                F.col("o_orderstatus"),
                (F.col("o_orderkey") % 500).cast("long"),
                (F.col("o_custkey") % 16).cast("long"),
            ).alias("tag")
        )
        .groupBy("tag")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
    )


_GENERATORS_ORACLE = """
WITH unpivoted AS (
  SELECT l_returnflag, 'qty' AS metric,
         CAST(l_quantity AS BIGINT) AS val
  FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'price_cents' AS metric,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS val
  FROM lineitem
)
SELECT l_returnflag, metric,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(val) AS BIGINT) AS total
FROM unpivoted
GROUP BY l_returnflag, metric
"""


@register("relational_generators_stack", _GENERATORS_ORACLE)
def relational_generators_stack(spark, sf_dir):
    """The stack() generator — Spark's row-constructor unpivot (each
    input row fans out to k metric rows inside the scan projection, no
    shuffle until the aggregate; the SQL-standard UNPIVOT twin is
    sql_unpivot_form). Oracle spelled as UNION ALL."""
    l = load(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("lineitem")
    return spark.sql("""
      SELECT l_returnflag, metric,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(val) AS BIGINT) AS total
      FROM (
        SELECT l_returnflag,
               stack(2,
                     'qty', CAST(l_quantity AS BIGINT),
                     'price_cents',
                     CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS (metric, val)
        FROM lineitem
      )
      GROUP BY l_returnflag, metric
    """)
