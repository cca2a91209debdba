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


def test_hourly_profile_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.events20 import events_hourly_profile

    rows = events_hourly_profile(spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        assert 0 <= r.hour_of_day <= 23
        by_type.setdefault(r.event_type, []).append(r)
    for tp, rs in by_type.items():
        assert sum(r.is_peak for r in rs) == 1
        peak = next(r for r in rs if r.is_peak)
        assert peak.n == max(r.n for r in rs)
        total_ppm = sum(r.share_ppm for r in rs)
        assert 1_000_000 - len(rs) <= total_ppm <= 1_000_000


def test_segment_migration_conserves_customers(spark, sf_dir):
    from syllabus_sense_spark.queries.relational9 import (
        orders_segment_migration,
    )

    rows = orders_segment_migration(spark, sf_dir).collect()
    # per (yr_from): outgoing customers with seg_from != (new) equal
    # that year's active customer count; every row positive
    assert all(r.n_customers > 0 for r in rows)
    assert any(r.seg_from == "(new)" for r in rows)
    assert any(r.seg_to == "(gone)" for r in rows)
    segs = {"HIGH", "MID", "LOW", "(new)", "(gone)"}
    assert all(r.seg_from in segs and r.seg_to in segs for r in rows)


def test_vocab_growth_monotone(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_text8 import text_vocab_growth

    rows = sorted(text_vocab_growth(spark, sf_dir).collect(), key=lambda r: r.bucket)
    assert rows[0].cum_vocab == rows[0].new_types
    for a, b in zip(rows, rows[1:]):
        assert b.cum_vocab == a.cum_vocab + b.new_types
        assert b.cum_tokens == a.cum_tokens + b.n_tokens
    # vocabulary grows sublinearly vs tokens (Heaps): each later
    # bucket introduces no more new types than the first
    assert all(r.new_types <= rows[0].new_types for r in rows[1:])


def test_norm_histogram_counts(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_text8 import embedding_norm_histogram
    from syllabus_sense_spark.tables import load

    rows = embedding_norm_histogram(spark, sf_dir).collect()
    assert sum(r.n_vectors for r in rows) == load(
        spark, sf_dir, "embeddings"
    ).count()
    assert all(r.norm_decibucket >= 0 for r in rows)
