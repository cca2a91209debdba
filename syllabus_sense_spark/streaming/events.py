"""Structured Streaming over the events stream (SURVEY.md §2 Table B
"Streaming" row; §7 step 7).

The reference's topic-at-a-time iterator + drain-the-queue loop
(A6/A17, syllabus_parser.py:97-116 + syllabus_ai_graph.py:285-318)
maps to a file-source ``readStream`` drained with
``trigger(availableNow=True)``: process everything that exists, then
stop — with watermarks bounding state exactly where the reference's
stuck-position safeguard bounded its loop.

These return running StreamingQuery handles writing to an in-memory
sink (tests + demos); production would swap the sink for a
partitioned parquet/Delta ``writeStream``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..session import tune

EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def _event_stream(spark: SparkSession, sf_dir: str):
    """File-source stream of the events table. The nanos `ts` arrives
    as long (see session.RUNTIME_CONF) and converts exactly like the
    batch loader."""
    tune(spark)
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def stream_hourly_counts(
    spark: SparkSession, sf_dir: str, query_name: str = "hourly_counts"
):
    """Tumbling 1h window counts with a 2h watermark, drained with
    availableNow into a memory sink. Returns the StreamingQuery."""
    events = _event_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )


def stream_session_windows(
    spark: SparkSession, sf_dir: str, query_name: str = "session_windows"
):
    """Native streaming sessionization: ``F.session_window`` with a
    30-minute gap and a watermark bounding session state — the
    streaming twin of the batch `events_session_window_native` query."""
    events = _event_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
