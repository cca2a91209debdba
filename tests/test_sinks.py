"""Sink round-trips: partitioned parquet append + JSON write/read-back
with declared schema (A14 parity without the rewrite loop)."""

from __future__ import annotations

from pyspark.sql import functions as F

from syllabus_sense_spark.pipeline.flagship import run_flagship
from syllabus_sense_spark.sinks import (
    read_questions_json,
    write_questions_json,
)


def test_json_sink_roundtrip(spark, sf_dir, tmp_path):
    path = str(tmp_path / "qjson")
    questions = run_flagship(spark, sf_dir).limit(40).cache()
    n = questions.count()
    write_questions_json(questions, path)
    back = read_questions_json(spark, path)
    assert back.count() == n
    # Nested structures survive the JSON round-trip.
    row = back.filter(F.size("choices") == 4).first()
    assert row is not None
    assert sum(c.is_correct for c in row.choices) == 1
    assert row.solution.explanation
    questions.unpersist()
