"""Driver-visible storage maintenance, part 2: CDC upsert, small-file
compaction, and z-order box pruning as CORRECTNESS rows — the last
sink surfaces whose evidence was pytest-only.

Each query performs the real maintenance operation in a temp layout
and returns a content aggregate whose DuckDB oracle recomputes the
expected final state straight from the source table: a hash match
certifies MERGE semantics / byte-preserving compaction / clustered-
layout correctness end-to-end. Structural guarantees the oracle
cannot see (file counts shrank; the box read touched a strict subset
of files) are asserted in-query, so a violation fails the row rather
than passing silently.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..sinks.compact import compact_partitioned, partition_file_stats
from ..sinks.layout import write_zorder_clustered
from ..sinks.upsert import upsert_partitioned
from ..tables import load
from . import register
from ._util import cents, scratch_dir, xsum

# --- CDC upsert -------------------------------------------------------------
# Change batch, derived deterministically from the source table:
#   updates: doc_id % 10 == 0 (and not deleted) -> text prefixed
#   deletes: doc_id % 13 == 0
#   inserts: doc_id % 17 == 0 -> new key doc_id + 1000000
_UPSERT_ORACLE = """
WITH base AS (SELECT doc_id, lang, text FROM documents),
final AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 10 = 0 THEN 'updated ' || text ELSE text END AS text
  FROM base WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 1000000, lang, 'inserted row' FROM base WHERE doc_id % 17 = 0
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(length(text)) AS BIGINT) AS sum_text_len
FROM final GROUP BY lang
"""


@register("sink_upsert_cdc", _UPSERT_ORACLE)
def sink_upsert_cdc(spark, sf_dir):
    base = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    path = os.path.join(scratch_dir("upsert_tbl_"), "docs")
    base.write.partitionBy("lang").mode("overwrite").parquet(path)
    updates = (
        base.filter((F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 13 != 0))
        .withColumn("text", F.concat(F.lit("updated "), F.col("text")))
        .withColumn("_deleted", F.lit(False))
    )
    deletes = base.filter(F.col("doc_id") % 13 == 0).withColumn(
        "_deleted", F.lit(True)
    )
    inserts = (
        base.filter(F.col("doc_id") % 17 == 0)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "lang",
            F.lit("inserted row").alias("text"),
        )
        .withColumn("_deleted", F.lit(False))
    )
    changes = updates.unionByName(deletes).unionByName(inserts)
    touched = upsert_partitioned(spark, path, changes, ["doc_id"], "lang")
    assert touched, "change batch must rewrite at least one partition"
    return (
        spark.read.parquet(path)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("sum_doc_id"),
            F.sum(F.length("text")).alias("sum_text_len"),
        )
    )


# --- compaction -------------------------------------------------------------
_COMPACT_ORACLE = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang
"""


@register("sink_compaction_roundtrip", _COMPACT_ORACLE)
def sink_compaction_roundtrip(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    path = os.path.join(scratch_dir("compact_tbl_"), "docs")
    # oversplit on purpose: many tiny files per lang partition
    d.repartition(16).write.partitionBy("lang").mode("overwrite").parquet(path)
    before = partition_file_stats(path)
    rewritten = compact_partitioned(
        spark, path, ["lang"], target_file_bytes=1 << 30
    )
    after = partition_file_stats(path)
    assert rewritten, "oversplit partitions must be compacted"
    for rel in rewritten:
        assert after[rel][0] < before[rel][0], (rel, before[rel], after[rel])
    return (
        spark.read.parquet(path)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("sum_doc_id"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# --- z-order box pruning ----------------------------------------------------
_ZORDER_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
       CAST(SUM(user_id) AS BIGINT) AS sum_user_id
FROM events
WHERE value >= 20 AND value < 40 AND user_id >= 100 AND user_id < 300
"""


@register("sink_zorder_box_query", _ZORDER_ORACLE)
def sink_zorder_box_query(spark, sf_dir):
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    bounds = e.agg(
        F.min("value"), F.max("value"), F.min("user_id"), F.max("user_id")
    ).collect()[0]
    path = os.path.join(scratch_dir("zorder_tbl_"), "events")
    write_zorder_clustered(
        e,
        path,
        "value",
        "user_id",
        x_range=(float(bounds[0]), float(bounds[1])),
        y_range=(float(bounds[2]), float(bounds[3])),
        target_files=8,
    )
    box = (
        (F.col("value") >= 20)
        & (F.col("value") < 40)
        & (F.col("user_id") >= 100)
        & (F.col("user_id") < 300)
    )
    clustered = spark.read.parquet(path)
    n_total_files = clustered.select(
        F.input_file_name()
    ).distinct().count()
    n_box_files = (
        clustered.filter(box).select(F.input_file_name()).distinct().count()
    )
    # the 2-D clustering guarantee: the box read touches a strict
    # subset of the files (min/max stats prune the rest)
    assert n_box_files < n_total_files, (n_box_files, n_total_files)
    return clustered.filter(box).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("event_id").alias("sum_event_id"),
        F.sum("user_id").alias("sum_user_id"),
    )


# --------------------------------------------------------------------------
# Bucketed co-located fact×fact join as a CORRECTNESS row: write both
# fact tables bucketed+sorted on the join key, join them, and assert
# IN-QUERY that the executed plan contains no Exchange on either side
# (the structural guarantee the oracle cannot see — a shuffle would
# fail the row, not pass silently). The returned aggregate
# hash-matches a plain-join oracle, certifying that bucket
# co-location changes the PLAN, never the RESULT. The broadcast
# threshold is disabled around planning to force the large×large
# regime — at test scale Spark would broadcast the small side, which
# bypasses bucketed scans entirely; at 100 TB neither side fits.
# --------------------------------------------------------------------------

_BUCKETED_ORACLE = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


@register("bucketed_join_roundtrip", _BUCKETED_ORACLE)
def bucketed_join_roundtrip(spark, sf_dir):

    from ..operators.bucketing import bucketed_join, write_bucketed
    from ._util import dec2

    tmp = scratch_dir("bucketed_rt_")
    lt, rt = "harness_b_orders", "harness_b_lineitem"
    spark.sql(f"DROP TABLE IF EXISTS {lt}")
    spark.sql(f"DROP TABLE IF EXISTS {rt}")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    lineitem = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity")
    )
    write_bucketed(orders, lt, f"{tmp}/o", "o_orderkey", 8)
    write_bucketed(lineitem, rt, f"{tmp}/l", "o_orderkey", 8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, on="o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, "bucketed join must not shuffle"
    assert "Bucketed: true" in plan, "scan must use bucketed layout"
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        xsum(cents("l_quantity"), 2, 18).alias("total_qty"),
    )
