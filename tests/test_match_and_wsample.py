"""Property checks for the entity-match and weighted-sample operators
(queries/ext_match.py) against pure-Python references.

The fuzzy-match check validates the whole operator — blocking,
ordered pair generation, and the Levenshtein verify — against a
from-scratch DP edit distance, so Spark's ``levenshtein`` semantics
(classic unit-cost edit distance) are pinned by the test, not
assumed. The sampler checks are laws: inclusion is decided per-row
by the seeded hash (rerun-stable), and zero-weight rows can never
be selected.
"""

from __future__ import annotations

import os
import tempfile
from collections import Counter

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _spark():
    from syllabus_sense_spark.session import get_spark

    return get_spark("match-property")


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


_WORDS = ["rose", "rosy", "ruse", "mint", "mist", "plum", "plume", "sage"]

_names = st.lists(
    st.tuples(
        st.sampled_from(["BrandA", "BrandB"]),
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=4),
    ),
    min_size=2,
    max_size=12,
)


@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(parts=_names)
def test_fuzzy_match_equals_python_reference(parts):
    from syllabus_sense_spark.queries.ext_match import _EDIT_MAX, match_fuzzy_parts

    spark = _spark()
    rows = [
        (i + 1, brand, " ".join(ws)) for i, (brand, ws) in enumerate(parts)
    ]
    with tempfile.TemporaryDirectory(prefix="sfmatch_") as tmp:
        pd.DataFrame(
            rows, columns=["p_partkey", "p_brand", "p_name"]
        ).to_parquet(os.path.join(tmp, "part.parquet"), index=False)
        got = Counter(
            (r.a_partkey, r.b_partkey, r.p_brand, r.edit_dist)
            for r in match_fuzzy_parts(spark, tmp).collect()
        )
    want = Counter()
    for ka, brand_a, name_a in rows:
        for kb, brand_b, name_b in rows:
            if ka >= kb or brand_a != brand_b:
                continue
            if name_a.split(" ")[0] != name_b.split(" ")[0]:
                continue
            d = _levenshtein(name_a, name_b)
            if d <= _EDIT_MAX:
                want[(ka, kb, brand_a, d)] += 1
    assert got == want


@settings(
    max_examples=4, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(parts=_names)
def test_capped_tier_equals_exact_below_guarantee_radius(parts):
    """Blocks smaller than CAP/2 are entirely inside the sorted-
    neighborhood guarantee radius, so the capped tier must emit
    exactly the exact tier's pairs (the gate-scale identity the
    oracle pin relies on)."""
    from syllabus_sense_spark.queries.ext_match import (
        match_fuzzy_parts,
        match_fuzzy_parts_capped,
    )

    spark = _spark()
    rows = [
        (i + 1, brand, " ".join(ws)) for i, (brand, ws) in enumerate(parts)
    ]
    with tempfile.TemporaryDirectory(prefix="sfmatchcap_") as tmp:
        pd.DataFrame(
            rows, columns=["p_partkey", "p_brand", "p_name"]
        ).to_parquet(os.path.join(tmp, "part.parquet"), index=False)
        exact = Counter(
            tuple(r) for r in match_fuzzy_parts(spark, tmp).collect()
        )
        capped = Counter(
            tuple(r) for r in match_fuzzy_parts_capped(spark, tmp).collect()
        )
    assert capped == exact


def test_capped_tier_pigeonhole_guarantee(tmp_path):
    """On a block far above the cap (150 rows, CAP=64): the capped
    tier emits (a) a SUBSET of the exact pairs, with no duplicates,
    (b) EVERY pair within CAP/2 sorted positions (the two overlapping
    chunkings cannot both cut an interval of rank length <= CAP/2),
    and (c) no pair further than CAP-1 positions apart (chunk width).
    Names are constructed so every pair verifies (digit suffixes
    differ in <= 3 positions) and rank order equals numeric order."""
    from syllabus_sense_spark.queries.ext_match import (
        _CAP,
        _HALF,
        match_fuzzy_parts_capped,
    )

    spark = _spark()
    n = 150
    rows = [(i + 1, "BrandX", f"word {i:03d}") for i in range(n)]
    pd.DataFrame(
        rows, columns=["p_partkey", "p_brand", "p_name"]
    ).to_parquet(os.path.join(tmp_path, "part.parquet"), index=False)
    got = [
        (r.a_partkey, r.b_partkey)
        for r in match_fuzzy_parts_capped(spark, str(tmp_path)).collect()
    ]
    assert len(got) == len(set(got)), "structural dedup must emit each pair once"
    pairs = set(got)
    # rank == p_partkey - 1 by construction
    for a, b in pairs:
        assert 1 <= abs(b - a) <= _CAP - 1
    for i in range(1, n + 1):
        for j in range(i + 1, min(i + _HALF, n) + 1):
            assert (i, j) in pairs, (
                f"pair ({i},{j}) is {j - i} <= CAP/2={_HALF} sorted "
                "positions apart and must be co-chunked in one scheme"
            )


@settings(
    max_examples=4, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(parts=_names)
def test_entity_canonical_equals_union_find(parts):
    """match_entity_canonical equals a from-scratch union-find over
    the capped tier's own pairs: canonical key = min partkey per
    component, cluster_size = component size, one row per matched
    part."""
    from syllabus_sense_spark.queries.ext_match import (
        match_entity_canonical,
        match_fuzzy_parts_capped,
    )

    spark = _spark()
    rows = [
        (i + 1, brand, " ".join(ws)) for i, (brand, ws) in enumerate(parts)
    ]
    with tempfile.TemporaryDirectory(prefix="sfmatchcanon_") as tmp:
        pd.DataFrame(
            rows, columns=["p_partkey", "p_brand", "p_name"]
        ).to_parquet(os.path.join(tmp, "part.parquet"), index=False)
        pairs = [
            (r.a_partkey, r.b_partkey)
            for r in match_fuzzy_parts_capped(spark, tmp).collect()
        ]
        got = {
            r.p_partkey: (r.canon_partkey, r.cluster_size)
            for r in match_entity_canonical(spark, tmp).collect()
        }
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, list[int]] = {}
    for node in parent:
        comps.setdefault(find(node), []).append(node)
    want = {
        n: (root, len(members))
        for root, members in comps.items()
        for n in members
    }
    assert got == want


def test_weighted_sample_laws(tmp_path):
    from syllabus_sense_spark.queries.ext_match import sample_weighted_bernoulli

    spark = _spark()
    n = 400
    # doc 0 has empty text (weight 0 — must never be sampled); the
    # rest ramp linearly so selectivity should grow with weight.
    texts = [""] + ["x" * (5 * i) for i in range(1, n)]
    pd.DataFrame(
        {
            "doc_id": range(n),
            "source": ["synthetic"] * n,
            "text": texts,
        }
    ).to_parquet(os.path.join(tmp_path, "documents.parquet"), index=False)

    first = {r.doc_id for r in sample_weighted_bernoulli(spark, str(tmp_path)).collect()}
    again = {r.doc_id for r in sample_weighted_bernoulli(spark, str(tmp_path)).collect()}
    assert first == again, "seeded-hash sampling must be rerun-stable"
    assert 0 not in first, "zero-weight rows can never be selected"
    # Monotone-in-expectation law, coarse-grained: the long half of the
    # corpus must be sampled at a strictly higher rate than the short
    # half (weights there are 5..1000 chars vs 1000+ capped — by
    # construction the long half has ~2x the average weight or more).
    short = sum(1 for d in first if 0 < d < n // 2)
    long_ = sum(1 for d in first if d >= n // 2)
    assert long_ > short


def test_top_paths_matches_python(tmp_path):
    """events_top_paths equals a from-scratch Python computation of
    the same definition (per-user (ts, event_id)-ordered 3-gram paths,
    global top-10 with count-desc/path-asc tiebreak) on a generated
    mini events table with deliberate ts ties across users."""
    from collections import Counter

    import pandas as pd

    from syllabus_sense_spark.queries.events7 import events_top_paths

    spark = _spark()
    types = ["view", "click", "buy"]
    rows = []
    eid = 0
    for u in range(1, 13):
        for k in range(u % 5 + 2):  # 2..6 events per user
            rows.append(
                (eid, pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=(k * 7) % 11),
                 u, types[(u * 3 + k) % 3], 1.0, "{}")
            )
            eid += 1
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = [(r.path, r.n_journeys) for r in events_top_paths(spark, str(tmp_path)).collect()]

    counts = Counter()
    for u, g in df.groupby("user_id"):
        seq = list(g.sort_values(["ts", "event_id"])["event_type"])
        for i in range(len(seq) - 2):
            counts[">".join(seq[i : i + 3])] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want
