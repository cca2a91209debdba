"""Property checks for rolling-hash winnowing fingerprints
(queries/ext_text6.py) against a from-scratch Python reference, plus
the MOSS guarantee the scheme exists for: two documents sharing a
substring of length ≥ W+K−1 share at least one fingerprint.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _spark():
    from syllabus_sense_spark.session import get_spark

    return get_spark("winnow-property")


def _py_winnow(text: str):
    from syllabus_sense_spark.queries.ext_text6 import B, K, M, W

    s = text.strip().lower()
    if len(s) < K + W - 1:
        return set()
    hs = []
    for i in range(len(s) - K + 1):
        h = 0
        for j in range(K):
            h += ord(s[i + j]) * pow(B, K - 1 - j, M)
        hs.append(h % M)
    return {
        (min(hs[sidx : sidx + W]))
        for sidx in range(len(hs) - W + 1)
    }


_texts = st.lists(
    st.text(alphabet="abcdef gh", min_size=0, max_size=80),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(texts=_texts)
def test_winnow_matches_python(texts):
    from syllabus_sense_spark.queries.ext_text6 import text_winnow_fingerprints

    spark = _spark()
    rows = [(i + 1, "synthetic", t) for i, t in enumerate(texts)]
    with tempfile.TemporaryDirectory(prefix="sfwin_") as tmp:
        pd.DataFrame(rows, columns=["doc_id", "source", "text"]).to_parquet(
            os.path.join(tmp, "documents.parquet"), index=False
        )
        got = {}
        for r in text_winnow_fingerprints(spark, tmp).collect():
            got.setdefault(r.doc_id, set()).add(r.fingerprint)
    want = {d: _py_winnow(t) for d, _, t in rows if _py_winnow(t)}
    assert got == want


def test_shared_substring_shares_fingerprint():
    from syllabus_sense_spark.queries.ext_text6 import (
        K,
        W,
        text_winnow_fingerprints,
    )

    spark = _spark()
    shared = "the quick brown fox jumps over it"  # ≥ W+K−1 = 23 chars
    assert len(shared) >= W + K - 1
    rows = [
        (1, "a", "prefix one " + shared + " suffix alpha"),
        (2, "b", "completely different head " + shared),
    ]
    with tempfile.TemporaryDirectory(prefix="sfwin2_") as tmp:
        pd.DataFrame(rows, columns=["doc_id", "source", "text"]).to_parquet(
            os.path.join(tmp, "documents.parquet"), index=False
        )
        fps = {}
        for r in text_winnow_fingerprints(spark, tmp).collect():
            fps.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert fps[1] & fps[2], "winnowing guarantee: shared substring ⇒ shared fp"
