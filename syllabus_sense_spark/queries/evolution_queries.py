"""Driver-visible schema evolution — converts sources/evolution.py
(mergeSchema read + conform projection) from pytest-only evidence into
a CORRECTNESS row.

The query stages real schema drift in a temp layout: generation 0
files carry (doc_id, lang) — the old pipeline version — and
generation 1 files carry (doc_id, source, n_chars) — the new version
that added quality columns and dropped lang. A single
``mergeSchema=true`` read unions the footers, ``conform`` projects
onto the declared target (typed nulls for each generation's missing
columns), and the per-generation aggregate ships non-null counts plus
value checksums — so the hash match certifies both the union-of-
schemas read AND that null-filling hit exactly the right rows with
the right values. Oracle rebuilds the same evolved view with explicit
NULL branches over the source table.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.evolution import conform, read_merged
from ..tables import load
from . import register
from ._util import scratch_dir

_TARGET = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

_EVOLUTION_ORACLE = """
WITH evolved AS (
  SELECT doc_id, lang, NULL AS source, NULL AS n_chars
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id, NULL, source, n_chars
  FROM documents WHERE doc_id % 2 = 1
)
SELECT CAST(doc_id % 2 AS BIGINT) AS generation,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(lang) AS BIGINT) AS n_with_lang,
       CAST(COUNT(source) AS BIGINT) AS n_with_source,
       CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_chars,
       CAST(COALESCE(SUM(length(lang)), 0) AS BIGINT) AS sum_lang_len
FROM evolved GROUP BY 1
"""


@register("source_schema_evolution", _EVOLUTION_ORACLE)
def source_schema_evolution(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    tmp = scratch_dir("schema_drift_")
    path = os.path.join(tmp, "docs_drift")
    # two pipeline generations writing different schemas into one layout
    d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.mode(
        "append"
    ).parquet(path)
    d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "source", "n_chars"
    ).write.mode("append").parquet(path)
    merged = conform(read_merged(spark, path), _TARGET)
    return merged.groupBy(
        (F.col("doc_id") % 2).cast("long").alias("generation")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("lang").alias("n_with_lang"),
        F.count("source").alias("n_with_source"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("sum_chars"),
        F.coalesce(F.sum(F.length("lang")), F.lit(0))
        .cast("long")
        .alias("sum_lang_len"),
    )
