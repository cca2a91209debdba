"""Property check: the prefix-filtered set-similarity join
(queries/ext_dedup3.py) returns EXACTLY the brute-force all-pairs
τ-Jaccard result on generated mini-corpora — the defining guarantee
of the All-Pairs/PPJoin family (a *filter*, not a sketch: zero false
negatives AND zero false positives after verify).

The Python reference recomputes everything from scratch — corpus
planting, 3-gram shingling, 48-bit md5 fingerprints, exact Jaccard
over fingerprint sets — so the Spark dataflow (df ranking, prefix
selection, candidate join, overlap verify) is validated against the
math, not against itself.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from itertools import combinations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _spark():
    from syllabus_sense_spark.session import get_spark

    return get_spark("prefix-property")


def _fp_set(text: str) -> set[int]:
    ws = [w for w in text.split(" ") if w]
    grams = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
    return {
        int(hashlib.md5(g.encode()).hexdigest()[:12], 16) for g in grams
    }


_VOCAB = ["ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen"]

_docs = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=3, max_size=20),
    min_size=2,
    max_size=10,
)


@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(docs=_docs)
def test_prefix_filter_equals_bruteforce(docs):
    from syllabus_sense_spark.queries.ext_dedup import _DUP_SUFFIX
    from syllabus_sense_spark.queries.ext_dedup3 import (
        _TAU_DEN,
        _TAU_NUM,
        dedup_prefix_filter,
    )

    spark = _spark()
    rows = [(i + 1, "synthetic", " ".join(ws)) for i, ws in enumerate(docs)]
    with tempfile.TemporaryDirectory(prefix="sfppj_") as tmp:
        pd.DataFrame(rows, columns=["doc_id", "source", "text"]).to_parquet(
            os.path.join(tmp, "documents.parquet"), index=False
        )
        got = {
            (r.a_doc, r.b_doc, r.overlap, r.union_size)
            for r in dedup_prefix_filter(spark, tmp).collect()
        }

    # Python reference: same corpus planting as ext_dedup._corpus.
    corpus = {d: _fp_set(t) for d, _, t in rows}
    for d, _, t in rows:
        if d % 7 == 0:
            corpus[d + 2000000] = _fp_set(t + _DUP_SUFFIX)
    want = set()
    for a, b in combinations(sorted(corpus), 2):
        sa, sb = corpus[a], corpus[b]
        if not sa or not sb:
            continue
        ov = len(sa & sb)
        if _TAU_DEN * ov >= _TAU_NUM * (len(sa) + len(sb) - ov):
            want.add((a, b, ov, len(sa) + len(sb) - ov))
    assert got == want


def test_prefix_filter_supersedes_lsh_pairs():
    """Cross-operator law: the exact prefix-filtered join can never
    miss a pair the MinHash LSH sketch found (at the prefix filter's
    own τ). LSH may drop true pairs (probabilistic recall); the
    All-Pairs filter is exact, so its result at τ = 3/5 must be a
    superset of the LSH-verified pairs with jaccard ≥ 3/5 — on the
    same planted corpus, same fingerprint table."""
    from syllabus_sense_spark.queries.ext_dedup import dedup_minhash_lsh
    from syllabus_sense_spark.queries.ext_dedup3 import (
        _TAU_DEN,
        _TAU_NUM,
        dedup_prefix_filter,
    )

    spark = _spark()
    sf_dir = "/root/testdata/sf0.001"
    exact = {
        (r.a_doc, r.b_doc) for r in dedup_prefix_filter(spark, sf_dir).collect()
    }
    lsh_rows = dedup_minhash_lsh(spark, sf_dir).collect()
    lsh_above_tau = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in lsh_rows
        if r.jaccard * _TAU_DEN >= _TAU_NUM
    }
    assert lsh_above_tau, "planted corpus must yield LSH pairs"
    missing = lsh_above_tau - exact
    assert not missing, f"exact join missed LSH-found pairs: {missing}"
