"""Driver-visible sink/source roundtrip queries.

These convert the partitioned-append sink (reference A14:
/root/reference/output_manager/file_output_manager.py:34-69, which
routes output by topic) and the JSONL quarantine source from
pytest-only evidence into CORRECTNESS rows: each query performs the
real write-then-read-back inside the harness and emits a scalar
aggregate the DuckDB oracle reproduces directly from the source
table, so a hash match certifies the storage roundtrip end-to-end
(partition routing, value fidelity, quarantine counts).

Scale posture: the sink is Spark's transactional partitioned append
(task retries never duplicate); the JSONL read is a declared-schema
PERMISSIVE parse where malformed lines land in a quarantine column
as data instead of killing the job — both unchanged from the
production code paths in sinks/ and sources/jsonl.py, which these
queries call rather than reimplement.
"""

from __future__ import annotations


from pyspark.sql import functions as F

from ..sinks import write_questions_parquet
from ..sources.jsonl import read_documents_jsonl, split_quarantine
from ..tables import load
from . import register
from ._util import scratch_dir

# Oracle computes the same per-partition aggregate straight from the
# source table: if the Spark side's write→read-back loses or mangles
# rows, partition values, or numeric columns, the hash diverges.
_SINK_ROUNDTRIP_ORACLE = """
SELECT lang AS topic,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars
FROM documents
GROUP BY lang
"""


@register("sink_roundtrip_partitioned", _SINK_ROUNDTRIP_ORACLE)
def sink_roundtrip_partitioned(spark, sf_dir):
    """Write documents through the topic-partitioned append sink to a
    fresh temp dir, read the files back, and aggregate per partition.
    A fresh dir per call keeps append-mode idempotent for the check;
    the dir must outlive the returned (lazy) DataFrame, so it is not
    removed here — it is tmpfs-sized (one small parquet per lang).
    """
    tmp = scratch_dir("sink_roundtrip_")
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("lang").alias("topic"),
        F.length("text").alias("n_chars"),
    )
    write_questions_parquet(d, tmp)
    back = spark.read.parquet(tmp)
    return back.groupBy("topic").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


# Clean rows = everything except the deterministically corrupted
# lines (doc_id ≡ 0 mod 50); the oracle never sees the JSONL file —
# agreement proves the quarantine split routed exactly those lines.
_JSONL_ORACLE = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars
FROM documents WHERE doc_id % 50 <> 0
GROUP BY lang
UNION ALL
SELECT '__quarantined__' AS lang,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(NULL AS BIGINT) AS sum_doc_id,
       CAST(NULL AS BIGINT) AS sum_chars
FROM documents WHERE doc_id % 50 = 0
"""


@register("jsonl_quarantine_stats", _JSONL_ORACLE)
def jsonl_quarantine_stats(spark, sf_dir):
    """Serialize documents to JSONL with every 50th doc's line
    deterministically corrupted, read the file back through the
    PERMISSIVE quarantine source, and report per-lang clean stats
    plus the quarantined-line count as one result set."""
    tmp = scratch_dir("jsonl_quarantine_")
    d = load(spark, sf_dir, "documents")
    line = F.to_json(F.struct("doc_id", "source", "lang", "text"))
    corrupted = F.concat(F.lit("{corrupt::"), F.substring(line, 1, 20))
    d.select(
        F.when(F.col("doc_id") % 50 == 0, corrupted).otherwise(line).alias("value")
    ).write.mode("overwrite").text(tmp)

    parsed = read_documents_jsonl(spark, tmp)
    clean, quarantined = split_quarantine(parsed)
    clean_stats = clean.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum(F.length("text")).cast("bigint").alias("sum_chars"),
    )
    quarantine_row = quarantined.agg(
        F.count(F.lit(1)).alias("n_rows")
    ).select(
        F.lit("__quarantined__").alias("lang"),
        F.col("n_rows"),
        F.lit(None).cast("bigint").alias("sum_doc_id"),
        F.lit(None).cast("bigint").alias("sum_chars"),
    )
    return clean_stats.unionByName(quarantine_row)


# Snapshot sink: the oracle derives both versions' summaries straight
# from the source table — a hash match proves (a) the append created
# v2 = v1 ∪ batch2 and (b) reading v1 AFTER v2 was published still
# returns exactly v1's rows (time travel / reader isolation).
_SNAPSHOT_ORACLE = """
SELECT CAST(1 AS BIGINT) AS version, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_id
FROM events WHERE event_id % 3 = 0 GROUP BY event_type
UNION ALL
SELECT CAST(2 AS BIGINT), event_type,
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(event_id) AS BIGINT)
FROM events WHERE event_id % 3 IN (0, 1) GROUP BY event_type
"""


@register("sink_snapshot_timetravel", _SNAPSHOT_ORACLE)
def sink_snapshot_timetravel(spark, sf_dir):
    """Publish two snapshot versions of the events table (v1 = ids
    ≡ 0 mod 3; v2 = v1 plus ids ≡ 1 mod 3 via append), then read BOTH
    through the manifest — v1 pinned after v2 exists — and emit
    per-version aggregates (sinks/snapshots.py)."""
    from ..sinks.snapshots import read_snapshot, write_snapshot

    e = load(spark, sf_dir, "events").select("event_id", "event_type")
    table = scratch_dir("snap_table_")
    v1 = write_snapshot(e.filter(F.col("event_id") % 3 == 0), table)
    v2 = write_snapshot(e.filter(F.col("event_id") % 3 == 1), table, mode="append")
    assert (v1, v2) == (1, 2), (v1, v2)

    def summary(version):
        return (
            read_snapshot(spark, table, version=version)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("event_id").alias("sum_event_id"),
            )
            .select(
                F.lit(version).cast("long").alias("version"),
                "event_type",
                "n_events",
                "sum_event_id",
            )
        )

    return summary(1).unionByName(summary(2))
