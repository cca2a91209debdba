"""Failure-path semantics (SURVEY.md §5.4): every external boundary
degrades to empty/quarantine, never to a crash — mirroring the
reference's discipline (syllabus_ai_graph.py:88-90 parse failure →
empty; file_output_manager.py:51-54 corrupt sink → fresh start;
syllabus_parser drop-unknown)."""

from __future__ import annotations

import zipfile

from pyspark.sql import functions as F

from syllabus_sense_spark.sinks import read_questions_json
from syllabus_sense_spark.sources.docx import read_docx_elements


def test_corrupt_docx_skipped_others_survive(spark, tmp_path):
    """An unparseable container is dropped; valid documents in the
    same scan still parse (task-level fault isolation)."""
    good = tmp_path / "good.docx"
    with zipfile.ZipFile(good, "w") as zf:
        zf.writestr(
            "word/document.xml",
            '<w:document xmlns:w="http://schemas.openxmlformats.org/'
            'wordprocessingml/2006/main"><w:body>'
            "<w:p><w:r><w:t>hello world</w:t></w:r></w:p>"
            "</w:body></w:document>",
        )
    (tmp_path / "broken.docx").write_bytes(b"this is not a zip container")

    out = read_docx_elements(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].text == "hello world"
    assert out[0].path.endswith("good.docx")


def test_corrupt_json_sink_rows_quarantine_as_nulls(spark, tmp_path):
    """Reading the sink back with a declared schema maps malformed
    lines to null rows (quarantinable) instead of schema drift or a
    crash — the Spark recast of corrupt-file → fresh start."""
    d = tmp_path / "topic=T1"
    d.mkdir(parents=True)
    (d / "part-000.json").write_text(
        '{"question_id": "q1", "text": "ok?", "sub_topic": "s", '
        '"academic_class": "Form 1", "examination_level": "MSCE", '
        '"difficulty": "Easy", "hint": "h"}\n'
        "NOT VALID JSON AT ALL\n"
    )
    df = read_questions_json(spark, str(tmp_path))
    rows = df.collect()
    ok = [r for r in rows if r.question_id is not None]
    bad = [r for r in rows if r.question_id is None]
    assert len(ok) == 1 and ok[0].question_id == "q1"
    assert len(bad) == 1  # quarantined, not crashed

    clean = df.filter(F.col("question_id").isNotNull())
    assert clean.count() == 1


def test_empty_input_pipeline_yields_empty_not_crash(spark):
    """Whole pipeline on an empty element stream → empty output with
    the declared schema (the reference's empty-document path)."""
    from syllabus_sense_spark.pipeline.flagship import flagship_from_elements

    empty = spark.createDataFrame(
        [],
        "sdoc_id long, element_idx long, element_type string, text string, "
        "rows array<array<string>>, is_topic_marker boolean",
    )
    out = flagship_from_elements(empty)
    assert out.count() == 0
    assert "question_id" in out.columns


def test_multimodal_feature_extract_shapes(spark, sf_dir):
    """Byte-histogram features: fixed dim 16, L1-normalized, and
    deterministic across runs (Arrow batch plumbing is real even
    though the codec is absent)."""
    from syllabus_sense_spark.queries.ext_multimodal import (
        FEATURE_SCHEMA, byte_histogram_features,
    )
    from syllabus_sense_spark.tables import load

    d = load(spark, sf_dir, "documents").limit(50)
    media = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    out = media.mapInPandas(byte_histogram_features, FEATURE_SCHEMA)
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-9
    again = {r.doc_id: tuple(r.features) for r in out.collect()}
    assert again == {r.doc_id: tuple(r.features) for r in rows}
