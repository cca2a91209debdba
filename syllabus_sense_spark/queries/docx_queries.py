"""A1 parity on the real fixture: the reference's only input document
(`chemistry_form_1_2.docx`, exercised by its main.py:15) through the
engine's distributed DOCX scan → marker flag → sessionize → topic
grouping chain.

Oracle: a GOLDEN literal — DuckDB cannot unzip OOXML, but the fixture
is a fixed input, so the expected 13 topic rows are recorded as a
VALUES table (independently pinned by measurement of the fixture:
13 "Core element" markers, 811 non-empty paragraphs, 18 tables,
asserted in tests/test_docx_source.py). A driver hash match therefore
certifies the whole binary path — zip central directory walk, XML
element parse, marker predicate, sessionize window, title extraction
— not just that it runs.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..operators.sessionize import extract_title, sessionize_elements
from ..sources.docx import docx_topics
from . import register

_FIXTURE_DIR = "/root/reference"

_GOLDEN_TOPICS = [
    (1, "Analytical skills in chemistry", 1, 5),
    (2, "Analytical skills in chemistry", 1, 2),
    (3, "Chemical composition of matter", 1, 1),
    (4, "Inorganic compounds", 1, 1),
    (5, "Inorganic compounds", 1, 1),
    (6, "Chemical reactions", 1, 1),
    (7, "Organic chemistry", 2, 1),
    (8, "Inorganic compounds", 1, 1),
    (9, "Chemical composition of matter", 1, 1),
    (10, "Chemical reactions", 1, 1),
    (11, "Organic chemistry", 1, 1),
    (12, "Environmental chemistry", 1, 1),
    (13, "Environmental chemistry", 1, 1),
]

_DOCX_ORACLE = (
    "SELECT doc_id, CAST(topic_id AS BIGINT) AS topic_id, title,\n"
    "       CAST(n_paragraphs AS BIGINT) AS n_paragraphs,\n"
    "       CAST(n_tables AS BIGINT) AS n_tables\nFROM (VALUES\n"
    + ",\n".join(
        f"  ('file:{_FIXTURE_DIR}/chemistry_form_1_2.docx', {t}, '{ti}', {p}, {n})"
        for t, ti, p, n in _GOLDEN_TOPICS
    )
    + "\n) AS g(doc_id, topic_id, title, n_paragraphs, n_tables)"
)


@register("docx_parse_topics", _DOCX_ORACLE)
def docx_parse_topics(spark, sf_dir):
    """One row per topic of the real syllabus: (doc, topic_id, title,
    n_paragraphs, n_tables), in document order."""
    if not os.path.exists(os.path.join(_FIXTURE_DIR, "chemistry_form_1_2.docx")):
        # Harness environments without the fixture: empty result with
        # the declared schema (failure→empty discipline).
        return spark.createDataFrame(
            [],
            "doc_id string, topic_id long, title string, "
            "n_paragraphs long, n_tables long",
        )
    elements = docx_topics(spark, _FIXTURE_DIR)
    sess = sessionize_elements(elements, doc_col="doc_id")
    return (
        sess.groupBy("doc_id", "topic_id")
        .agg(
            F.first(
                F.when(
                    F.col("is_topic_marker"),
                    extract_title(F.col("text"), "Core element"),
                ),
                ignorenulls=True,
            ).alias("title"),
            F.count(
                F.when(
                    (F.col("element_type") == "paragraph")
                    & ~F.col("is_topic_marker"),
                    1,
                )
            ).alias("n_paragraphs"),
            F.count(F.when(F.col("element_type") == "table", 1)).alias("n_tables"),
        )
        .orderBy("doc_id", "topic_id")
    )
