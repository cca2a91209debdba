"""Spark 4 API surfaces as first-class engine coverage: Python UDTF
(lateral table functions) and the VARIANT semi-structured type.

- ``udtf_chunk_documents``: a correlated LATERAL Python UDTF that
  splits each document into fixed 10-token chunks (the
  retrieval/context-window chunking step of an LLM data pipeline).
  The chunk semantics are SQL-expressible (the DuckDB oracle proves
  it), so the UDTF here plays the same role as the pipeline's
  pandas_udf seams: it exercises the 1→N Python table-function
  surface with bounded per-row work — swap the body for a real
  tokenizer and the plan shape is unchanged. Arrow-batched
  (``useArrow``); at 100 TB this is scan-shaped, no shuffle.
- ``variant_props_stats``: ``parse_json`` → VariantType →
  ``variant_get`` typed extraction over the events ``props`` JSON —
  Spark 4's schema-on-read path for semi-structured columns. Unlike
  ``json_extract_props`` (string-path get_json_object), the variant
  is parsed once and typed extraction happens on the binary variant
  encoding; per-decile stats keep the output shape distinct.

Reference anchor: json round-trips at syllabus_ai_graph.py:71,127,253;
chunk-into-batches at syllabus_ai_graph.py:163-167.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_CHUNK = 10

_UDTF_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> length(x) > 0) AS w
  FROM documents
)
SELECT t.doc_id,
       c.i AS chunk_id,
       CAST(len(list_slice(t.w, c.i * {_CHUNK} + 1,
                           least((c.i + 1) * {_CHUNK}, len(t.w)))) AS BIGINT)
         AS n_tok,
       md5(array_to_string(
             list_slice(t.w, c.i * {_CHUNK} + 1,
                        least((c.i + 1) * {_CHUNK}, len(t.w))), ' '))
         AS chunk_md5
FROM t, UNNEST(range(CAST(ceil(len(t.w) / {_CHUNK}.0) AS BIGINT))) AS c(i)
"""


@register("udtf_chunk_documents", _UDTF_ORACLE)
def udtf_chunk_documents(spark, sf_dir):
    import hashlib

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, chunk_id: bigint, n_tok: bigint, chunk_md5: string",
          useArrow=True)
    class ChunkDocuments:
        def eval(self, doc_id: int, text: str):
            toks = [x for x in text.split(" ") if x]
            for i in range(0, (len(toks) + _CHUNK - 1) // _CHUNK):
                chunk = toks[i * _CHUNK : (i + 1) * _CHUNK]
                yield (
                    doc_id,
                    i,
                    len(chunk),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                )

    load(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("chunk_documents", ChunkDocuments)
    return spark.sql(
        "SELECT c.doc_id, c.chunk_id, c.n_tok, c.chunk_md5 "
        "FROM _udtf_docs d, LATERAL chunk_documents(d.doc_id, d.text) c"
    )


_VARIANT_ORACLE = """
SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS BIGINT)
         AS k_decile,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
FROM events
GROUP BY k_decile
"""


@register("variant_props_stats", _VARIANT_ORACLE)
def variant_props_stats(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type",
        F.variant_get("v", "$.k", "bigint").alias("k"),
    )
    return (
        v.select((F.col("k") / 10).cast("bigint").alias("k_decile"), "event_type", "k")
        .groupBy("k_decile")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.countDistinct("event_type").cast("bigint").alias("n_types"),
        )
    )


# GROUP BY ALL: the same ANSI text runs verbatim as the DuckDB oracle
# — the engine's SQL front-door, not just the DataFrame API.
_GROUP_BY_ALL_SQL = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
GROUP BY ALL
"""


@register("sql_group_by_all", _GROUP_BY_ALL_SQL)
def sql_group_by_all(spark, sf_dir):
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUP_BY_ALL_SQL)


# --------------------------------------------------------------------------
# Collation (Spark 4): case-insensitive grouping via UNICODE_CI. The
# harness langs are already lowercase, so the query first *creates*
# case drift (upper-cases even doc_ids — deterministic), then groups
# under the collation; the surfaced key is normalized with lower() so
# both engines emit identical strings. DuckDB twin groups on
# lower(...) — same semantics for ASCII case drift.
# --------------------------------------------------------------------------

_COLLATE_ORACLE = """
WITH drifted AS (
  SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END AS lang_mixed,
         n_chars
  FROM documents
)
SELECT lower(lang_mixed) AS lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM drifted
GROUP BY lower(lang_mixed)
"""


@register("collation_ci_grouping", _COLLATE_ORACLE)
def collation_ci_grouping(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    drifted = d.select(
        F.when(F.col("doc_id") % 2 == 0, F.upper("lang"))
        .otherwise(F.col("lang"))
        .alias("lang_mixed"),
        "n_chars",
    )
    return (
        drifted.groupBy(F.collate("lang_mixed", "UNICODE_CI").alias("_k"))
        .agg(
            F.lower(F.max("lang_mixed")).alias("lang"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select("lang", "n_docs", "total_chars")
    )


# --------------------------------------------------------------------------
# Regexp family: counts/positions — pure codegen expressions in
# Spark; DuckDB lacks regexp_count, so its twin measures via
# len(regexp_extract_all(...)). Patterns stay in the Java∩RE2 subset
# (no backrefs/lookaround) so both engines agree.
# --------------------------------------------------------------------------

_REGEXP_ORACLE = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, 'ta[a-z]+')) AS BIGINT)
         AS n_ta_words,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers,
       regexp_matches(text, 'spark') AS mentions_spark
FROM documents
"""


@register("regexp_functions", _REGEXP_ORACLE)
def regexp_functions(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(r"ta[a-z]+")).alias("n_ta_words"),
        F.regexp_count("text", F.lit(r"[0-9]+")).alias("n_numbers"),
        F.regexp("text", F.lit("spark")).alias("mentions_spark"),
    )
