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
    """KLL's guarantee is RANK error (~1.65% std at default k=200; the
    value-space gap can be arbitrarily large where density is thin and
    compaction is randomized), so assert: the rank the merged sketch
    assigns to each EXACT quantile value is within 5% of the target
    rank; plus a value-domain sanity check."""
    from syllabus_sense_spark.queries.ext_sketches import merged_kll

    e = load(spark, sf_dir, "events")
    p50, p95, p99 = e.selectExpr(
        "percentile(value, 0.5)", "percentile(value, 0.95)", "percentile(value, 0.99)"
    ).collect()[0]
    ranks = (
        merged_kll(spark, sf_dir)
        .select(
            *[
                F.kll_sketch_get_rank_double("kll", F.lit(v)).alias(f"r{i}")
                for i, v in enumerate((p50, p95, p99))
            ]
        )
        .collect()[0]
    )
    for got_rank, want_rank in zip(ranks, (0.5, 0.95, 0.99)):
        assert abs(got_rank - want_rank) <= 0.05, (got_rank, want_rank)
    lo, hi = e.selectExpr("min(value)", "max(value)").collect()[0]
    row = sketch_kll_value_quantiles(spark, sf_dir).collect()[0]
    for got in (row.p50, row.p95, row.p99):
        assert lo <= got <= hi
    assert row.p50 <= row.p95 <= row.p99


def test_agg_approx_sketches_within_error(spark, sf_dir):
    """agg_approx_sketches is rows-only (HLL/percentile internals are
    engine-specific, so no cross-engine oracle); its accuracy law
    lives here: per-status approx distinct buyers within 5% of exact
    (HLL lgk default ~1.6% std err), approx p50 within the value range
    bracketed by exact p40-p60 (percentile_approx guarantees rank
    error <= 1/accuracy = 0.1%)."""
    from syllabus_sense_spark.queries.windows2 import agg_approx_sketches

    got = {
        r.o_orderstatus: r for r in agg_approx_sketches(spark, sf_dir).collect()
    }
    o = load(spark, sf_dir, "orders")
    exact = {
        r.o_orderstatus: r
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("d"),
            F.expr("percentile(o_totalprice, 0.4)").alias("p40"),
            F.expr("percentile(o_totalprice, 0.6)").alias("p60"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for status, e in exact.items():
        g = got[status]
        assert abs(g.approx_buyers - e.d) / e.d < 0.05, (status, g, e)
        assert e.p40 <= g.approx_p50 <= e.p60, (status, g.approx_p50, e.p40, e.p60)
        assert g.n_orders == e.n  # the exact column must BE exact
