"""A20 parity: the typed engine-error layer (errors.py) mirrors the
reference's exception hierarchy (/root/reference/exceptions.py:1-18)
— caller-level misuse raises a ``SyllabusSenseSparkError`` subclass at
the driver; data-level faults still degrade to empty (covered in
test_failure_paths.py)."""

from __future__ import annotations

import pytest

from syllabus_sense_spark import (
    InvalidDocumentSourceError,
    InvalidOutputDirectoryError,
    SyllabusSenseSparkError,
    TableNotFoundError,
)
from syllabus_sense_spark.sinks import write_questions_parquet
from syllabus_sense_spark.sources.docx import read_docx_elements
from syllabus_sense_spark.tables import load


def test_sink_path_is_file_raises_typed_error(spark, sf_dir, tmp_path):
    f = tmp_path / "not_a_dir.txt"
    f.write_text("occupied")
    df = load(spark, sf_dir, "region").limit(0).selectExpr("'x' AS topic")
    with pytest.raises(InvalidOutputDirectoryError) as ei:
        write_questions_parquet(df, str(f))
    assert str(f) in str(ei.value)
    assert isinstance(ei.value, SyllabusSenseSparkError)


def test_docx_missing_path_raises_typed_error(spark, tmp_path):
    missing = str(tmp_path / "definitely" / "absent")
    with pytest.raises(InvalidDocumentSourceError):
        read_docx_elements(spark, missing)


def test_unknown_table_raises_typed_error(spark, sf_dir):
    with pytest.raises(TableNotFoundError) as ei:
        load(spark, sf_dir, "no_such_table")
    # Back-compat: it is still a KeyError for dict-style callers.
    assert isinstance(ei.value, KeyError)


def test_stall_guard_stops_idle_tail(spark, sf_dir, tmp_path):
    """A processing-time tail over a source with no new arrivals is
    stopped by the stuck-cursor guard instead of spinning (A17,
    syllabus_ai_graph.py:306-312)."""
    from syllabus_sense_spark.sources.synthetic import filtered_elements
    from syllabus_sense_spark.streaming.flagship import (
        drain_with_progress_guard,
        element_stream,
    )

    elements_dir = str(tmp_path / "elements")
    filtered_elements(spark, sf_dir).limit(50).coalesce(1).write.parquet(
        elements_dir
    )

    q = (
        element_stream(spark, elements_dir)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        # The backlog (1 batch) drains, then the source is idle forever:
        # the guard must stop the query and report the stall.
        terminated_on_its_own = drain_with_progress_guard(
            q, max_idle_polls=3, poll_interval_s=1.0
        )
        assert terminated_on_its_own is False
        assert not q.isActive
    finally:
        if q.isActive:
            q.stop()


def test_stall_guard_passes_through_available_now(spark, sf_dir, tmp_path):
    """availableNow terminates by itself after draining; the guard
    reports clean termination (True) and does not interfere."""
    from syllabus_sense_spark.sources.synthetic import filtered_elements
    from syllabus_sense_spark.streaming.flagship import (
        drain_with_progress_guard,
        element_stream,
    )

    elements_dir = str(tmp_path / "elements")
    filtered_elements(spark, sf_dir).limit(50).coalesce(1).write.parquet(
        elements_dir
    )

    q = (
        element_stream(spark, elements_dir)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert drain_with_progress_guard(q, max_idle_polls=30, poll_interval_s=0.5)
    assert not q.isActive
