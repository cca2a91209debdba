"""Law tests for the inequality/apportionment/time-series wave
(relational13 / events22 / dq_queries7)."""

from __future__ import annotations


def test_gini_bounds_and_reference(spark, sf_dir):
    from syllabus_sense_spark.queries.relational13 import (
        customer_gini_segment,
    )
    from syllabus_sense_spark.tables import load

    rows = customer_gini_segment(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.gini_ppm < 1_000_000  # G ∈ [0, 1)
    # recompute one segment exactly in python
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = {
        r.c_custkey: r.c_mktsegment
        for r in load(spark, sf_dir, "customer").collect()
    }
    rev = {}
    for r in o.collect():
        cents = round(float(r.o_totalprice) * 100)
        rev[r.o_custkey] = rev.get(r.o_custkey, 0) + cents
    seg = rows[0].segment
    xs = sorted(v for k, v in rev.items() if c[k] == seg)
    n, s = len(xs), sum(xs)
    s1 = sum((i + 1) * x for i, x in enumerate(xs))
    expect = (2 * s1 - (n + 1) * s) * 1_000_000 // (n * s)
    got = next(r for r in rows if r.segment == seg)
    assert (got.n_customers, got.cents, got.gini_ppm) == (n, s, expect)


def test_largest_remainder_sums_to_budget(spark, sf_dir):
    from syllabus_sense_spark.queries.relational13 import (
        _BUDGET,
        alloc_largest_remainder,
    )

    rows = alloc_largest_remainder(spark, sf_dir).collect()
    # the defining apportionment law: allocations sum EXACTLY to budget
    assert sum(r.alloc_units for r in rows) == _BUDGET
    for r in rows:
        assert r.alloc_units - r.base_units in (0, 1)
    total = sum(r.cents for r in rows)
    for r in rows:
        assert r.base_units == _BUDGET * r.cents // total
    # quota property (Hamilton's method never violates quota):
    # base ≤ alloc ≤ base + 1 already checked; alloc within ±1 of the
    # real-valued quota
    for r in rows:
        quota = _BUDGET * r.cents / total
        assert quota - 1 < r.alloc_units < quota + 1


def test_ewma_matches_python_scan(spark, sf_dir):
    from syllabus_sense_spark.queries.events22 import (
        _DENOM,
        _K,
        events_ewma_daily,
    )

    rows = events_ewma_daily(spark, sf_dir).collect()
    by_type = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.day)):
        by_type.setdefault(r.event_type, []).append(r)
    for seq in by_type.values():
        cnts = [r.cnt for r in seq]
        for i, r in enumerate(seq):
            window = cnts[max(0, i - _K + 1) : i + 1]
            num = sum(
                c * 2 ** (_K - 1 - (len(window) - 1 - j))
                for j, c in enumerate(window)
            )
            assert r.ewma_num == num
            assert r.ewma_milli == num * 1000 // _DENOM
            # once the horizon is full, smoothing stays inside the
            # data range (cold-start rows are zero-padded by design
            # and may sit below min(window))
            if len(window) == _K:
                assert min(window) * 1000 - 1000 <= r.ewma_milli
            assert r.ewma_milli <= max(window) * 1000
    # steady-state sanity: weights sum to DENOM = 2^K - 1
    assert _DENOM == 2**_K - 1


def test_trigram_paths_conservation(spark, sf_dir):
    from syllabus_sense_spark.queries.events22 import events_trigram_paths
    from syllabus_sense_spark.tables import load

    rows = events_trigram_paths(spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events").groupBy("user_id").count().collect()
    # each user with m ≥ 3 events contributes exactly m − 2 trigrams
    expect = sum(max(0, r["count"] - 2) for r in ev)
    assert sum(r.n_paths for r in rows) == expect
    assert all(r.t1 and r.t2 and r.t3 for r in rows)


def test_chisq_term_nonneg_and_dof(spark, sf_dir):
    from syllabus_sense_spark.queries.dq_queries7 import dq_chisq_independence
    from syllabus_sense_spark.tables import load

    (r,) = dq_chisq_independence(spark, sf_dir).collect()
    n_types = (
        load(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .count()
    )
    assert r.dof == (n_types - 1) * (2 - 1)
    assert r.n_cells == n_types * 2
    assert r.chisq_ppm >= 0
    assert r.n_events == load(spark, sf_dir, "events").count()
    # χ² is bounded above by g·min(rows−1, cols−1) = g·1 for a 2-col table
    assert r.chisq_ppm <= r.n_events * 1_000_000
