"""As-of join semantics: inclusive match, tiebreak, inner vs left."""

from __future__ import annotations

import datetime as dt

from syllabus_sense_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_basic_and_ties(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-05")),
            (2, 10, _ts("2024-01-01")),  # before any right row → null
            (3, 10, _ts("2024-01-03")),  # equal-ts match is inclusive
            (4, 20, _ts("2024-01-10")),  # other key
        ],
        "probe_id long, key long, t timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-03"), 100),
            (10, _ts("2024-01-03"), 101),  # tie on ts → max(val) wins
            (10, _ts("2024-01-04"), 102),
            (20, _ts("2024-01-02"), 200),
        ],
        "key long, rt timestamp, val long",
    )
    out = {
        r.probe_id: r.val
        for r in asof_join(
            left, right, on="key", left_time="t", right_time="rt",
            value_cols=["val"], tiebreak="val",
        ).collect()
    }
    assert out[1] == 102  # latest before 01-05
    assert out[2] is None  # nothing on/before 01-01
    assert out[3] == 101  # inclusive match at equal ts, tiebreak max
    assert out[4] == 200

    inner = asof_join(
        left, right, on="key", left_time="t", right_time="rt",
        value_cols=["val"], how="inner", tiebreak="val",
    ).collect()
    assert {r.probe_id for r in inner} == {1, 3, 4}


def test_asof_inner_keeps_null_valued_match(spark):
    """how='inner' drops only UNMATCHED probes: a matched reference
    row whose first value column is NULL must survive (the match test
    is on the carried struct, not on value_cols[0])."""
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-05")),  # matches the NULL-val row
            (2, 10, _ts("2024-01-01")),  # no match → dropped
        ],
        "probe_id long, key long, t timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-04"), None, 7)],
        "key long, rt timestamp, val long, val2 long",
    )
    inner = asof_join(
        left, right, on="key", left_time="t", right_time="rt",
        value_cols=["val", "val2"], how="inner",
    ).collect()
    assert len(inner) == 1
    assert inner[0].probe_id == 1
    assert inner[0].val is None and inner[0].val2 == 7


def test_asof_multikey_and_full_collision(spark):
    """Composite join keys, plus the degenerate tiebreak case: two
    reference rows identical in (key, ts, tiebreak) — the carried
    struct must still come from ONE row (atomic multi-column carry),
    never mix columns across the tied rows."""
    left = spark.createDataFrame(
        [(1, 10, "a", _ts("2024-01-05")), (2, 10, "b", _ts("2024-01-05"))],
        "probe_id long, k1 long, k2 string, t timestamp",
    )
    right = spark.createDataFrame(
        [
            # full collision on (key, ts, tiebreak): payloads pair
            # (3, 30) vs (3, 31) — val2 must match whichever row won.
            (10, "a", _ts("2024-01-04"), 3, 30),
            (10, "a", _ts("2024-01-04"), 3, 31),
            (10, "b", _ts("2024-01-03"), 7, 70),
        ],
        "k1 long, k2 string, rt timestamp, val long, val2 long",
    )
    rows = {
        r.probe_id: r
        for r in asof_join(
            left, right, on=["k1", "k2"], left_time="t", right_time="rt",
            value_cols=["val", "val2"], tiebreak="val",
        ).collect()
    }
    assert rows[1].val == 3 and rows[1].val2 in (30, 31)
    assert rows[2].val == 7 and rows[2].val2 == 70
