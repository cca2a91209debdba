"""A1 parity on the real fixture: the reference's only input document
(`chemistry_form_1_2.docx`, exercised by its main.py:15) through the
engine's distributed DOCX scan → marker flag → sessionize → topic
grouping chain.

Rows-only (the oracle cannot unzip OOXML), but the expected shape is
pinned by measurement of the fixture (SURVEY.md §0): 13 topics from 13
"Core element" markers, 811 non-empty paragraphs, 18 tables —
asserted in tests/test_docx_source.py; this query exposes the same
chain to the harness.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..operators.sessionize import extract_title, sessionize_elements
from ..sources.docx import docx_topics
from . import register

_FIXTURE_DIR = "/root/reference"


@register("docx_parse_topics")  # rows-only: input is a binary OOXML container
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
