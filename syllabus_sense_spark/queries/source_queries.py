"""Driver-visible format-coverage roundtrips: ORC and line-oriented
text.

Parquet, JSONL (quarantine), and CSV (nested-type bridge) already
carry CORRECTNESS rows; these add the remaining formats the engine
ships without extra jars. Same contract as sink_queries.py: the
query performs the real write-then-read-back inside the harness and
emits an aggregate the DuckDB oracle computes straight from the
source table, so a hash match certifies the format roundtrip
(type fidelity, row preservation) end-to-end.

- ORC: the other columnar format a lakehouse ingests from; written
  with zlib (the default), read back through the vectorized ORC
  reader. Certifies BIGINT/VARCHAR/TIMESTAMP fidelity.
- text: `spark.read.text` — the rawest corpus ingestion path (one
  line = one record), which is how a 100 TB web-text drop actually
  arrives before it has schema. Certifies line preservation
  (count + char mass) through write.text → read.text.

Scale posture: both writes are task-parallel appends to a fresh dir;
neither query shuffles anything except the final small aggregate.
Avro stays gated out: the spark-avro jar is absent from this image
(SURVEY "gated/stretch" note).
"""

from __future__ import annotations


from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import scratch_dir

_ORC_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
       CAST(SUM(user_id) AS BIGINT) AS sum_user_id,
       CAST(SUM(CAST(epoch_us(ts) AS BIGINT) % 1000000007) AS BIGINT)
         AS sum_ts_mod
FROM events
GROUP BY event_type
"""


@register("source_orc_roundtrip", _ORC_ORACLE)
def source_orc_roundtrip(spark, sf_dir):
    """events → ORC → read back → per-type aggregate. The temp dir
    must outlive the returned lazy DataFrame (tmpfs-sized)."""
    from ._util import epoch_us

    tmp = scratch_dir("orc_roundtrip_")
    ev = load(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    ev.write.mode("overwrite").orc(tmp)
    back = spark.read.orc(tmp)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("event_id").alias("sum_event_id"),
        F.sum("user_id").alias("sum_user_id"),
        # modular residue keeps the checksum inside BIGINT at any scale
        F.sum(epoch_us(F.col("ts")) % 1_000_000_007).alias("sum_ts_mod"),
    )


_TEXT_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
       CAST(SUM(length(text) * (doc_id % 97)) AS BIGINT) AS weighted_chars
FROM documents
"""


@register("source_text_lines", _TEXT_ORACLE)
def source_text_lines(spark, sf_dir):
    """documents.text → write.text (one line per doc) → read.text.
    Line identity is certified by char mass plus a position-free
    weighted checksum recomputed from a doc_id prefix embedded in
    each line (lines come back in arbitrary order; the checksum is
    order-insensitive)."""
    tmp = scratch_dir("text_lines_")
    d = load(spark, sf_dir, "documents").select(
        F.concat(
            (F.col("doc_id") % 97).cast("string"), F.lit("\t"), F.col("text")
        ).alias("value")
    )
    d.write.mode("overwrite").text(tmp)
    back = spark.read.text(tmp).select(
        F.split("value", "\t", 2).alias("parts")
    ).select(
        F.col("parts")[0].cast("bigint").alias("w"),
        F.length(F.col("parts")[1]).cast("bigint").alias("n_chars"),
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(F.col("n_chars") * F.col("w")).alias("weighted_chars"),
    )


_PYDS_ORACLE = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY lang
"""


@register("sink_pyds_jsonl_roundtrip", _PYDS_ORACLE)
def sink_pyds_jsonl_roundtrip(spark, sf_dir):
    """documents → custom Python DataSource JSONL sink (two-phase
    task-commit protocol, sources/jsonl_datasource.py) → read back →
    per-lang aggregate. A hash match certifies the writer publishes
    exactly the successful tasks' rows: a lost/duplicated shard or a
    visible temp file diverges immediately."""
    from pyspark.sql.types import StructType

    from ..sources.jsonl_datasource import register_jsonl_sink

    register_jsonl_sink(spark)
    tmp = scratch_dir("pyds_jsonl_")
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    d.write.format("jsonl_sink").option("path", tmp).mode("append").save()
    schema = (
        StructType()
        .add("doc_id", "long")
        .add("lang", "string")
        .add("n_chars", "long")
    )
    back = spark.read.schema(schema).json(tmp + "/*.jsonl")
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum("n_chars").alias("sum_chars"),
    )
