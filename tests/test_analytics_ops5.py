"""Law tests for the burst/LTV/calibration/sliding-stream batch."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_burst_bounds(spark, sf_dir):
    from syllabus_sense_spark.queries.events16 import events_burst_detection
    from syllabus_sense_spark.tables import load

    rows = events_burst_detection(spark, sf_dir).collect()
    n_users = (
        load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert len(rows) == n_users
    for r in rows:
        # single-minute peak ≤ adjacent-pair peak ≤ 2× single peak
        assert r.max_minute_events <= r.max_burst2
        assert r.max_burst2 <= 2 * r.max_minute_events
        assert r.is_burst == (1 if r.max_burst2 >= 10 else 0)


def test_cohort_ltv_laws(spark, sf_dir):
    from decimal import Decimal

    from syllabus_sense_spark.queries.relational7 import orders_cohort_ltv
    from syllabus_sense_spark.tables import load

    rows = orders_cohort_ltv(spark, sf_dir).collect()
    total = sum(
        int(Decimal(str(round(r.o_totalprice, 2))) * 100)
        for r in load(spark, sf_dir, "orders").select("o_totalprice").collect()
    )
    assert sum(r.cents for r in rows) == total
    # cohort month 0 always exists and cum is monotone per cohort
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_midx, []).append(r)
    for midx, rs in by_cohort.items():
        rs.sort(key=lambda r: r.months_since)
        assert rs[0].months_since == 0
        cums = [r.cum_cents for r in rs]
        assert cums == sorted(cums)
        assert cums[-1] == sum(r.cents for r in rs)


def test_minhash_calibration_estimator(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_dedup6 import (
        dedup_minhash_calibration,
    )

    rows = dedup_minhash_calibration(spark, sf_dir).collect()
    assert rows, "planted pairs must appear in the calibration report"
    for r in rows:
        assert 0 <= r.sig_matches <= 16
        assert r.est_ppm == r.sig_matches * 62_500
        assert 0 <= r.true_ppm <= 1_000_000
    # planted near-dupes are high-Jaccard: the estimator must track
    # that on average (binomial noise bounds a single pair loosely)
    avg_true = sum(r.true_ppm for r in rows) / len(rows)
    avg_est = sum(r.est_ppm for r in rows) / len(rows)
    assert avg_true >= 600_000
    assert abs(avg_est - avg_true) <= 250_000
