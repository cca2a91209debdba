"""Property-based check of marker sessionization against a direct
Python re-statement of the reference's walk (syllabus_parser.py:118-154):
markers open topics, rows before the first marker are discarded, each
row joins the most recent topic — for arbitrary element streams."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from syllabus_sense_spark.operators.sessionize import sessionize_elements

_docs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # doc_id
        st.booleans(),                            # is_topic_marker
    ),
    min_size=0,
    max_size=40,
)


def _reference_walk(rows):
    """The reference's per-document cursor loop, verbatim semantics."""
    out = {}
    per_doc: dict[int, list] = {}
    for doc, marker in rows:
        per_doc.setdefault(doc, []).append(marker)
    for doc, markers in per_doc.items():
        topic = 0
        for idx, m in enumerate(markers):
            if m:
                topic += 1
            if topic > 0:
                out[(doc, idx)] = topic
    return out


def _spark():
    from syllabus_sense_spark.session import get_spark

    return get_spark("sessionize-property")


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=_docs)
def test_sessionize_matches_reference_walk(rows):
    spark = _spark()
    indexed = []
    counters: dict[int, int] = {}
    for doc, marker in rows:
        idx = counters.get(doc, 0)
        counters[doc] = idx + 1
        indexed.append((doc, idx, marker))
    df = spark.createDataFrame(
        indexed or [(None, None, None)],
        "doc_id long, element_idx long, is_topic_marker boolean",
    ).dropna()
    got = {
        (r.doc_id, r.element_idx): r.topic_id
        for r in sessionize_elements(df).collect()
    }
    assert got == _reference_walk(rows)
