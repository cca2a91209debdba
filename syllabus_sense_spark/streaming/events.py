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

EVENTS_SCHEMA_NANOS = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)
# ts is timestamp_ntz, not timestamp: the plain ``timestamp[us]``
# parquet encoding (no tz annotation) surfaces as TIMESTAMP_NTZ from
# the batch loader, and the stream source must type-match tables.load
# exactly — an LTZ declaration is value-equal only while the session
# timezone is UTC, a latent mismatch for stream/batch unions.
EVENTS_SCHEMA_MICROS = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def _event_stream(spark: SparkSession, sf_dir: str):
    """File-source stream of the events table.

    Streaming sources need a declared schema, and the harness parquet
    has shipped two physical encodings of ``ts`` (TIMESTAMP(NANOS),
    which session.RUNTIME_CONF surfaces as long, and plain
    ``timestamp[us]``) — so probe the batch-read schema once and
    branch, converting exactly like the batch loader (tables.load).
    """
    tune(spark)
    probe = (
        spark.read.option("pathGlobFilter", "events.parquet").parquet(sf_dir).schema
    )
    ts_type = next(f.dataType.simpleString() for f in probe if f.name == "ts")
    schema = EVENTS_SCHEMA_NANOS if ts_type == "bigint" else EVENTS_SCHEMA_MICROS
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ts_type == "bigint":
        # timestamp_micros yields LTZ; surface NTZ to match tables.load.
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
        )
    return raw


def state_partitions(spark: SparkSession, sf_dir: str):
    """Context manager sizing ``spark.sql.shuffle.partitions`` — which
    pins a NEW stream's state-store partition count at checkpoint
    creation — to the input volume, then restoring the session value.

    The stateful drains inherited the batch default (32), but a
    stream-stream join runs 4 state stores per partition and every
    micro-batch commits each one: at the sf1 probe the 128 store
    commits per batch, not row work, dominated (full-outer drain:
    6.2 s at 32 partitions, 3.4 s at 16, 2.6 s at 8 — same output).
    Sizing by rows keeps both regimes honest: small drains stop
    paying fixed commit cost for empty partitions, and a 100 TB
    stream gets MORE partitions, not fewer (the cap is generous; at
    ~250k state rows per partition each store stays comfortably in
    executor memory). Only the streaming query planned inside the
    ``with`` block is affected — batch queries read the conf at their
    own execution time, and the session value is restored on exit.
    """
    import contextlib

    import pyarrow.parquet as pq

    @contextlib.contextmanager
    def _cm():
        key = "spark.sql.shuffle.partitions"
        old = spark.conf.get(key)
        try:
            total = pq.ParquetFile(
                f"{sf_dir}/events.parquet"
            ).metadata.num_rows
        except Exception:  # noqa: BLE001 — unknown size: keep session value
            total = 0
        if total:
            spark.conf.set(key, str(max(8, min(256, total // 250_000))))
        try:
            yield
        finally:
            spark.conf.set(key, old)

    return _cm()


def _with_event_time(df, col: str = "ts"):
    """Project the NTZ event-time column to TIMESTAMP (LTZ) at the
    watermark boundary: Spark's event-time machinery (withWatermark,
    window, session_window) requires LTZ and rejects NTZ. The session
    timezone is pinned UTC, so the cast is value-preserving — the same
    convention as queries/_util.epoch_us. Only stateful pipelines call
    this; pass-through streams keep NTZ for exact type parity with the
    batch loader."""
    return df.withColumn(col, F.col(col).cast("timestamp"))


def stream_hourly_counts(
    spark: SparkSession, sf_dir: str, query_name: str = "hourly_counts"
):
    """Tumbling 1h window counts with a 2h watermark, drained with
    availableNow into a memory sink. Returns the StreamingQuery."""
    events = _with_event_time(_event_stream(spark, sf_dir))
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
    events = _with_event_time(_event_stream(spark, sf_dir))
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


def stream_view_purchase_join(
    spark: SparkSession, sf_dir: str, query_name: str = "view_purchase"
):
    """Stream-stream interval join: each purchase matched to the same
    user's views in the preceding hour. Both sides carry watermarks so
    the join state is bounded (views kept ≤ 1h + watermark); append
    mode because matches finalize once the watermark passes.

    At scale this is the attribution-join shape: state is
    per-user-per-hour, sharded by the equi-key (user_id), and the
    range predicate bounds retention — no unbounded buffering.
    """
    events = _with_event_time(_event_stream(spark, sf_dir))
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", "2 hours")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select("p_user", "purchase_id", "view_id", "p_ts", "v_ts", "purchase_value")
    return (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_enrich_static_dim(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "enrich_dim",
    output_dir: str | None = None,
):
    """Stream-static broadcast enrichment: the event stream joins the
    static customer dimension per micro-batch — the canonical streaming
    lookup-join (the reference's A12 broadcast join, streaming form).

    The static side is a plain batch DataFrame re-resolved each
    micro-batch (so a dimension refresh between batches is picked up);
    broadcast keeps the join shuffle-free — stream state is ZERO
    because stream-static joins are stateless. Miss-drop (inner)
    mirrors the reference's behavior of skipping unmatched rows.
    """
    from ..tables import load

    events = _event_stream(spark, sf_dir)
    dim = F.broadcast(
        load(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_name").alias("customer_name"),
            F.col("c_nationkey").alias("nation_key"),
        )
    )
    enriched = events.join(dim, "user_id", "inner").select(
        "event_id", "user_id", "event_type", "ts", "customer_name", "nation_key"
    )
    if output_dir is not None:
        # Production sink shape: this stream emits O(|events|) rows
        # (a pass-through enrichment, not an aggregate), so a memory
        # sink serializes the whole corpus through the driver — at the
        # sf1 probe that single-threaded collect was 10 of the 11 s,
        # and at 10x it is a driver OOM. Aggregating drains keep the
        # memory sink (small state); every O(N)-output drain writes
        # files executor-side.
        return (
            enriched.writeStream.format("parquet")
            .option("path", output_dir)
            .option("checkpointLocation", output_dir + "/_checkpoint")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    return (
        enriched.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_dedupe_within_watermark(
    spark: SparkSession, sf_dir: str, query_name: str = "dedup_wm"
):
    """Streaming exact dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps a key's state only until
    the watermark passes its event time, so at 100 TB/day the dedup
    state is a sliding window of keys, not the full history (the
    unbounded-history variant is a compaction job, not stream state).

    Duplicates are simulated by unioning the source with itself —
    i.e. the at-least-once delivery a real ingest bus exhibits; the
    output must equal the distinct input exactly.
    """
    ev = _with_event_time(_event_stream(spark, sf_dir)).select(
        "event_id", "user_id", "event_type", "ts"
    )
    at_least_once = ev.unionByName(
        _with_event_time(_event_stream(spark, sf_dir)).select(ev.columns)
    )
    deduped = at_least_once.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_sliding_counts(
    spark: SparkSession, sf_dir: str, query_name: str = "sliding_counts"
):
    """SLIDING 2h windows advancing 1h (every event lands in exactly
    two windows), 2h watermark, availableNow drain into a memory
    sink. The overlapping-window shape `stream_hourly_counts` can't
    express. Returns the StreamingQuery."""
    events = _with_event_time(_event_stream(spark, sf_dir))
    agg = (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "2 hours", "1 hour"), F.col("event_type"))
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


def stream_session_windows_dynamic(
    spark: SparkSession, sf_dir: str, query_name: str = "session_windows_dynamic"
):
    """Streaming sessionization with a PER-EVENT gap (purchase keeps
    the session alive 60 minutes, anything else 30): the dynamic-gap
    form of ``F.session_window``, state-store session merging with
    per-event timeouts. Watermark bounds session state exactly as in
    the fixed-gap twin; the batch twin is
    queries/events24.events_sessionize_dynamic_gap."""
    events = _with_event_time(_event_stream(spark, sf_dir))
    gap = F.expr(
        "CASE WHEN event_type = 'purchase' THEN '60 minutes'"
        " ELSE '30 minutes' END"
    )
    agg = (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("n_purchases"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "n_purchases",
        )
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
