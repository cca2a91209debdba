"""Sessionization invariants (SURVEY.md §5.3/§5.5), including
randomized marker placement via hypothesis."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from syllabus_sense_spark.operators.sessionize import (
    group_topics,
    sessionize_elements,
)
from syllabus_sense_spark.sources.synthetic import filtered_elements


def _make_elements(spark, marker_flags):
    rows = [
        (0, i, "paragraph", f"Core element Topic {i}" if m else f"text {i}", None, bool(m))
        for i, m in enumerate(marker_flags)
    ]
    return spark.createDataFrame(
        rows,
        "doc_id long, element_idx long, element_type string, text string, "
        "rows array<array<string>>, is_topic_marker boolean",
    )


@settings(max_examples=15, deadline=None)
@given(st.lists(st.booleans(), min_size=1, max_size=40))
def test_sessionize_partitions_elements(shared_spark, marker_flags):
    spark = shared_spark
    df = _make_elements(spark, marker_flags)
    sess = sessionize_elements(df).collect()

    n_markers = sum(marker_flags)
    first_marker = marker_flags.index(True) if n_markers else None

    # Every non-preamble element lands in exactly one topic.
    expected_rows = len(marker_flags) - (first_marker if first_marker is not None else len(marker_flags))
    assert len(sess) == expected_rows
    # Topic count == marker count.
    assert len({r.topic_id for r in sess}) == n_markers
    # Each topic starts at its marker and ids are 1..n in order.
    for r in sess:
        assert 1 <= r.topic_id <= n_markers


# hypothesis can't take a pytest fixture directly; bridge it.
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def shared_spark(spark):
    return spark


def test_group_topics_order_and_title(spark):
    flags = [False, True, False, False, True, False]
    df = _make_elements(spark, flags)
    topics = group_topics(sessionize_elements(df)).orderBy("topic_id").collect()
    assert [t.topic_id for t in topics] == [1, 2]
    assert topics[0].title == "Topic 1"
    # Elements preserve document order within the topic.
    assert [e.text for e in topics[0].elements] == ["text 2", "text 3"]
    assert [e.text for e in topics[1].elements] == ["text 5"]


def test_preamble_discarded(spark, sf_dir):
    sess = sessionize_elements(filtered_elements(spark, sf_dir), doc_col="sdoc_id")
    assert sess.filter(F.col("topic_id") == 0).count() == 0
    # Preamble rows existed in the input (element_idx 0 < first marker at 1).
    pre = filtered_elements(spark, sf_dir).filter(F.col("element_idx") == 0)
    assert pre.count() > 0


def test_title_strip_variants(spark):
    rows = [
        (0, 0, "paragraph", "Core element Alpha", None, True),
        (1, 0, "paragraph", "Core element - Beta", None, True),
        (2, 0, "paragraph", "Core element: Gamma", None, True),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, element_idx long, element_type string, text string, "
        "rows array<array<string>>, is_topic_marker boolean",
    )
    topics = group_topics(sessionize_elements(df)).orderBy("doc_id").collect()
    assert [t.title for t in topics] == ["Alpha", "Beta", "Gamma"]
