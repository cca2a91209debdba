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
