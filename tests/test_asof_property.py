"""Property-based check of the as-of join against an independent
reference implementation (pandas ``merge_asof``): for arbitrary
probe/reference sets the union+window composition must agree with
pandas' sorted binary-search semantics (backward, inclusive).

Tiebreak note: ``merge_asof`` keeps the LAST row among equal
reference timestamps in input order, so the reference frame is
pre-sorted by (time, tiebreak) to make "last" == "max tiebreak",
matching ``asof_join(tiebreak=...)``.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from syllabus_sense_spark.operators.asof import asof_join

_keys = st.integers(min_value=0, max_value=3)
_times = st.integers(min_value=0, max_value=50)

_probes = st.lists(st.tuples(_keys, _times), min_size=1, max_size=25)
_refs = st.lists(
    st.tuples(_keys, _times, st.integers(min_value=0, max_value=99)),
    min_size=0,
    max_size=25,
)


def _spark():
    # The session fixture is function-scoped via conftest's session
    # fixture; hypothesis re-invokes the test body many times, so grab
    # the already-running session directly.
    from syllabus_sense_spark.session import get_spark

    return get_spark("asof-property")


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(probes=_probes, refs=_refs)
def test_asof_matches_pandas_merge_asof(probes, refs):
    spark = _spark()
    left_rows = [(i, k, t) for i, (k, t) in enumerate(probes)]
    right_rows = [(k, t, v) for (k, t, v) in refs]

    left = spark.createDataFrame(left_rows, "probe_id long, key long, t long")
    right = spark.createDataFrame(
        right_rows or [(None, None, None)], "key long, rt long, val long"
    ).dropna()

    got = {
        r.probe_id: r.val
        for r in asof_join(
            left, right, on="key", left_time="t", right_time="rt",
            value_cols=["val"], tiebreak="val",
        ).collect()
    }

    lpdf = pd.DataFrame(left_rows, columns=["probe_id", "key", "t"]).sort_values("t")
    rpdf = pd.DataFrame(right_rows, columns=["key", "rt", "val"]).sort_values(
        ["rt", "val"], kind="stable"
    )
    if rpdf.empty:
        want = {i: None for i, _, _ in left_rows}
    else:
        merged = pd.merge_asof(
            lpdf, rpdf, left_on="t", right_on="rt", by="key",
            direction="backward", allow_exact_matches=True,
        )
        want = {
            int(r.probe_id): (None if pd.isna(r.val) else int(r.val))
            for r in merged.itertuples()
        }
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(probes=_probes, refs=_refs, direction=st.sampled_from(["forward", "nearest"]))
def test_asof_forward_nearest_match_pandas(probes, refs, direction):
    """Forward and nearest directions vs merge_asof. Reference rows
    are pre-reduced to one max-val row per (key, rt): pandas' forward
    search keeps the FIRST of an equal-rt block while backward keeps
    the LAST, so no single presort expresses our greatest-tiebreak
    rule for both sides — and only the max-val row per (key, rt) can
    ever win under that rule anyway (tie resolution itself is pinned
    by test_asof_direction_tiebreaks)."""
    spark = _spark()
    left_rows = [(i, k, t) for i, (k, t) in enumerate(probes)]
    rpdf = pd.DataFrame(refs, columns=["key", "rt", "val"])
    rpdf = rpdf.groupby(["key", "rt"], as_index=False)["val"].max()
    right_rows = list(rpdf.itertuples(index=False, name=None))

    left = spark.createDataFrame(left_rows, "probe_id long, key long, t long")
    right = spark.createDataFrame(
        right_rows or [(None, None, None)], "key long, rt long, val long"
    ).dropna()

    got = {
        r.probe_id: r.val
        for r in asof_join(
            left, right, on="key", left_time="t", right_time="rt",
            value_cols=["val"], tiebreak="val", direction=direction,
        ).collect()
    }

    lpdf = pd.DataFrame(left_rows, columns=["probe_id", "key", "t"]).sort_values("t")
    if rpdf.empty:
        want = {i: None for i, _, _ in left_rows}
    else:
        merged = pd.merge_asof(
            lpdf, rpdf.sort_values("rt"), left_on="t", right_on="rt",
            by="key", direction=direction, allow_exact_matches=True,
        )
        want = {
            int(r.probe_id): (None if pd.isna(r.val) else int(r.val))
            for r in merged.itertuples()
        }
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    probes=_probes,
    refs=st.lists(
        st.tuples(
            _keys,
            _times,
            st.one_of(st.none(), st.integers(min_value=0, max_value=99)),
        ),
        min_size=0,
        max_size=25,
    ),
)
def test_asof_inner_drops_exactly_the_unmatched(probes, refs):
    """Property of the round-8 inner fix: for reference rows whose
    value column may be NULL, how='inner' keeps exactly the probes the
    left join matched (carried reference time non-null) — matched rows
    with NULL values survive, and surviving values equal the left
    join's."""
    spark = _spark()
    left_rows = [(i, k, t) for i, (k, t) in enumerate(probes)]
    # rt duplicated as a value column: non-null iff the probe matched
    right_rows = [(k, t, v, t) for (k, t, v) in refs]

    left = spark.createDataFrame(left_rows, "probe_id long, key long, t long")
    right = spark.createDataFrame(
        right_rows or [(None, None, None, None)],
        "key long, rt long, val long, rt_v long",
    ).filter("key IS NOT NULL")

    kw = dict(
        on="key", left_time="t", right_time="rt",
        value_cols=["val", "rt_v"], tiebreak="rt_v",
    )
    outer = {r.probe_id: (r.val, r.rt_v) for r in asof_join(left, right, **kw).collect()}
    inner = {r.probe_id: (r.val, r.rt_v) for r in asof_join(left, right, how="inner", **kw).collect()}

    matched = {pid for pid, (_, rt_v) in outer.items() if rt_v is not None}
    assert set(inner) == matched
    for pid in inner:
        assert inner[pid] == outer[pid]


def test_asof_direction_tiebreaks():
    """Pinned tie semantics: equal-rt reference rows resolve to the
    greatest tiebreak in EVERY direction, and an exact nearest
    distance tie prefers the backward candidate."""
    spark = _spark()
    left = spark.createDataFrame(
        [(0, 1, 3), (1, 1, 5), (2, 1, 7)], "probe_id long, key long, t long"
    )
    right = spark.createDataFrame(
        [(1, 5, 1), (1, 5, 9), (1, 9, 4)], "key long, rt long, val long"
    )

    def run(direction):
        return {
            r.probe_id: r.val
            for r in asof_join(
                left, right, on="key", left_time="t", right_time="rt",
                value_cols=["val"], tiebreak="val", direction=direction,
            ).collect()
        }

    # backward: t=3 has no prior ref; t=5 and t=7 take rt=5's max val.
    assert run("backward") == {0: None, 1: 9, 2: 9}
    # forward: t=3 and t=5 take rt=5's max val; t=7 takes rt=9.
    assert run("forward") == {0: 9, 1: 9, 2: 4}
    # nearest: t=7 is exactly 2 from both rt=5 and rt=9 — backward
    # (rt=5, max val 9) must win the distance tie.
    assert run("nearest") == {0: 9, 1: 9, 2: 9}
