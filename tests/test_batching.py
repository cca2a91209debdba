"""Batch pagination invariants (SURVEY.md §5.5): batches partition the
plan; all-but-last have exactly batch_size rows (mirrors
syllabus_ai_graph.py:163-173)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
import pytest

from syllabus_sense_spark.operators.batching import assign_batches, mark_batch_status


@pytest.fixture(scope="session")
def shared_spark(spark):
    return spark


@settings(max_examples=10, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=60),
    batch_size=st.integers(min_value=1, max_value=9),
)
def test_batches_partition_plan(shared_spark, n, batch_size):
    spark = shared_spark
    plan = spark.createDataFrame(
        [(f"q{i:03d}", "t1", "s1", "Easy", "c", "planned") for i in range(n)],
        "question_id string, topic string, subtopic string, difficulty string, "
        "concept_area string, status string",
    )
    rows = assign_batches(plan, batch_size=batch_size).collect()
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r.batch_id, []).append(r.question_id)
    # Batches are contiguous 0..k and partition the plan.
    ids = sorted(by_batch)
    assert ids == list(range(len(ids)))
    assert sum(len(v) for v in by_batch.values()) == n
    # All-but-last are exactly batch_size.
    for b in ids[:-1]:
        assert len(by_batch[b]) == batch_size
    assert 1 <= len(by_batch[ids[-1]]) <= batch_size


def test_status_update_marks_selected_batch(spark):
    plan = spark.createDataFrame(
        [(f"q{i}", "t1", "s1", "Easy", "c", "planned") for i in range(12)],
        "question_id string, topic string, subtopic string, difficulty string, "
        "concept_area string, status string",
    )
    out = mark_batch_status(assign_batches(plan, batch_size=5), batch_id=1).collect()
    for r in out:
        expected = "generating" if r.batch_id == 1 else "planned"
        assert r.status == expected
