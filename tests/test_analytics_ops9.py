"""Law tests for the k-means / linear gap-fill / rules-engine batch."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_kmeans_1d_partitions_values(spark, sf_dir):
    from syllabus_sense_spark.queries.ml_queries3 import (
        _K,
        cluster_kmeans_1d_prices,
    )
    from syllabus_sense_spark.tables import load

    rows = sorted(
        cluster_kmeans_1d_prices(spark, sf_dir).collect(),
        key=lambda r: r.centroid_cents,
    )
    assert 1 <= len(rows) <= _K
    n_vals = load(spark, sf_dir, "events").count()
    assert sum(r.n for r in rows) == n_vals
    # clusters ordered by centroid tile the value axis
    for a, b in zip(rows, rows[1:]):
        assert a.hi_cents <= b.lo_cents
    for r in rows:
        assert r.lo_cents <= r.centroid_cents + 1 or r.n == 0
        assert r.lo_cents <= r.hi_cents


def test_gapfill_linear_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.events19 import events_gapfill_linear

    rows = events_gapfill_linear(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r.day)
        # spine is contiguous
        assert [r.day for r in rs] == list(
            range(rs[0].day, rs[-1].day + 1)
        )
        # endpoints observed; observed rows carry themselves
        assert rs[0].observed_cents is not None
        assert rs[-1].observed_cents is not None
        for r in rs:
            if r.observed_cents is not None:
                assert r.filled_cents == r.observed_cents
            else:
                assert r.filled_cents is not None
        # interpolated values stay inside the neighboring observed range
        obs = [
            (r.day, r.observed_cents)
            for r in rs
            if r.observed_cents is not None
        ]
        import bisect

        days = [d for d, _ in obs]
        for r in rs:
            if r.observed_cents is None:
                i = bisect.bisect_left(days, r.day)
                lo = min(obs[i - 1][1], obs[i][1])
                hi = max(obs[i - 1][1], obs[i][1])
                assert lo <= r.filled_cents <= hi


def test_rules_engine_single_pass_counts(spark, sf_dir):
    from syllabus_sense_spark.queries.dq_queries6 import (
        _RULES,
        dq_rules_engine,
    )
    from syllabus_sense_spark.tables import load

    rows = {r.rule_id: r for r in dq_rules_engine(spark, sf_dir).collect()}
    assert set(rows) == {rid for rid, _ in _RULES}
    n = load(spark, sf_dir, "orders").count()
    for rid, pred in _RULES:
        r = rows[rid]
        assert r.n_rows == n
        expected_viol = (
            load(spark, sf_dir, "orders")
            .filter(~F.expr(pred))
            .count()
        )
        assert r.n_violations == expected_viol
        assert r.pass_ppm == (n - expected_viol) * 1_000_000 // n
