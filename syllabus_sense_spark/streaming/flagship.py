"""Streaming variant of the flagship pipeline (SURVEY.md §7 step 7) —
the reference's incremental topic-at-a-time processing
(_base_syllabus_ai_graph_template.py:114-159) recast as a file-source
micro-batch drain.

Unit-of-work correctness: sessionization (A5) must see a document's
elements together — a topic must never straddle a micro-batch. The
reference guarantees this by pulling one complete topic per iteration;
here the file source guarantees it because each input file holds whole
documents and Spark assigns whole files to micro-batches
(``maxFilesPerTrigger``). Inside each micro-batch, ``foreachBatch``
runs the identical batch chain (``flagship_from_elements``) and
appends to a partitioned parquet sink (A14) — so streaming output ==
batch output, which ``tests/test_streaming_flagship.py`` asserts.

At 100 TB this is the production ingest shape: new document dumps land
as files; ``availableNow`` drains the backlog with bounded state (no
cross-document state exists — sessionization is per-document), then
the same job tails new arrivals with a processing-time trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..pipeline.flagship import flagship_from_elements
from ..session import tune

ELEMENT_STREAM_SCHEMA = (
    "sdoc_id long, element_idx long, element_type string, text string, "
    "rows array<array<string>>, is_topic_marker boolean"
)


def element_stream(spark: SparkSession, elements_dir: str) -> DataFrame:
    """File-source stream of syllabus elements; one file = whole
    documents, read at most 2 files per micro-batch to exercise the
    multi-batch path even on small fixtures."""
    tune(spark)
    return (
        spark.readStream.schema(ELEMENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "2")
        .parquet(elements_dir)
    )


def stream_flagship_drain(
    spark: SparkSession, elements_dir: str, out_dir: str, checkpoint_dir: str
):
    """Drain all pending element files through the flagship chain into
    a partitioned parquet sink; returns the StreamingQuery (call
    ``awaitTermination()``; ``availableNow`` stops it when drained)."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        questions = flagship_from_elements(batch_df)
        (
            questions.write.partitionBy("topic")
            .mode("append")
            .parquet(out_dir)
        )

    return (
        element_stream(spark, elements_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
