"""Mergeable-sketch accuracy: merged daily sketches answer global
questions within documented error of the exact recomputation."""

from __future__ import annotations

from pyspark.sql import functions as F

from syllabus_sense_spark.queries.ext_sketches import (
    sketch_hll_distinct_users,
    sketch_kll_value_quantiles,
)
from syllabus_sense_spark.tables import load


def test_hll_merge_matches_exact_within_error(spark, sf_dir):
    est = {
        r.event_type: r.distinct_users_est
        for r in sketch_hll_distinct_users(spark, sf_dir).collect()
    }
    e = load(spark, sf_dir, "events")
    exact_total = e.select("user_id").distinct().count()
    # HLL default lgk=12 → ~1.6% standard error; allow 5%.
    assert abs(est["__all__"] - exact_total) / exact_total < 0.05
    exact_by_type = {
        r.event_type: r.d
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    for t, d in exact_by_type.items():
        assert abs(est[t] - d) / d < 0.05, (t, est[t], d)


def test_kll_merge_quantiles_close_to_exact(spark, sf_dir):
    row = sketch_kll_value_quantiles(spark, sf_dir).collect()[0]
    e = load(spark, sf_dir, "events")
    p50, p95, p99 = e.selectExpr(
        "percentile(value, 0.5)", "percentile(value, 0.95)", "percentile(value, 0.99)"
    ).collect()[0]
    spread = e.selectExpr("max(value) - min(value)").collect()[0][0]
    for got, want in [(row.p50, p50), (row.p95, p95), (row.p99, p99)]:
        assert abs(got - want) <= 0.02 * spread + 1e-9, (got, want)
