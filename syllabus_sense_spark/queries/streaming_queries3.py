"""Streaming batch 3 — the Python DataSource STREAMING writer under
the harness: events stream → `jsonl_sink` stream tier (per-epoch
two-phase commit with idempotent publish,
sources/jsonl_datasource.py:JsonlStreamWriter) → JSONL shards read
back with an explicit schema and hash-checked against the batch
table. The read-back equals the source exactly BECAUSE the sink's
epoch markers make replayed micro-batches publish nothing — the
same exactly-once argument as `streaming_foreachbatch_sink_drain`,
now carried by the custom-connector surface itself (crash-replay is
unit-exercised in tests/test_jsonl_stream_sink.py).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from . import register

_PYDS_STREAM_ORACLE = """
SELECT event_id, user_id, event_type FROM events
"""


@register("streaming_pyds_jsonl_sink_drain", _PYDS_STREAM_ORACLE)
def streaming_pyds_jsonl_sink_drain(spark, sf_dir):
    from ..sources.jsonl_datasource import register_jsonl_sink
    from ..streaming.events import _event_stream

    register_jsonl_sink(spark)
    out = tempfile.mkdtemp(prefix="pyds_stream_out_")
    ev = _event_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type"
    )
    q = (
        ev.writeStream.format("jsonl_sink")
        .option("path", out)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="pyds_stream_ckpt_")
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "availableNow stream drain timed out"
    shards = os.path.join(out, "batch-*.jsonl")
    return (
        spark.read.schema("event_id long, user_id long, event_type string")
        .json(shards)
        .select("event_id", "user_id", "event_type")
    )
