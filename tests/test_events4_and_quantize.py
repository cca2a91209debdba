"""Law-based tests for the interval-join / gap-fill / histogram
queries (events4) and int8 embedding quantization (ext_similarity2).
Cross-engine value equality is covered by the oracle gate; these pin
the invariants that survive any data."""

from __future__ import annotations

from pyspark.sql import functions as F

from syllabus_sense_spark.queries.events4 import (
    events_gapfill_forward,
    events_histogram_bins,
    events_interval_join_views,
)
from syllabus_sense_spark.queries.ext_similarity2 import (
    embedding_quantize_int8,
)
from syllabus_sense_spark.tables import load


def test_interval_join_one_row_per_purchase(spark, sf_dir):
    out = events_interval_join_views(spark, sf_dir)
    n_purchases = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert out.count() == n_purchases
    # left join: zero-view purchases survive with count 0, value 0.0
    zero = out.filter(F.col("n_prior_views") == 0)
    assert zero.filter(F.col("prior_view_value") != 0.0).count() == 0


def test_gapfill_dense_and_filled(spark, sf_dir):
    out = events_gapfill_forward(spark, sf_dir).cache()
    try:
        # per user: contiguous daily spine over the active span
        spans = out.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            (F.datediff(F.max("day"), F.min("day")) + 1).alias("span"),
        )
        assert spans.filter(F.col("n") != F.col("span")).count() == 0
        # forward fill leaves no nulls (first day is always observed)
        assert out.filter(F.col("filled_value").isNull()).count() == 0
        # non-gap rows equal the observed (user, day) aggregate set
        observed = (
            load(spark, sf_dir, "events")
            .select(
                "user_id",
                F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
            )
            .distinct()
            .count()
        )
        assert out.filter(~F.col("is_gap")).count() == observed
    finally:
        out.unpersist()


def test_histogram_partitions_all_events(spark, sf_dir):
    out = events_histogram_bins(spark, sf_dir).cache()
    try:
        total = load(spark, sf_dir, "events").count()
        agg = out.agg(
            F.sum("n_events").alias("n"),
            F.min("bin_id").alias("lo"),
            F.max("bin_id").alias("hi"),
        ).collect()[0]
        assert agg.n == total
        assert agg.lo >= 0 and agg.hi <= 9
        # bins are value-disjoint: max of bin i stays below min of bin i+1
        rows = sorted(out.collect(), key=lambda r: r.bin_id)
        for a, b in zip(rows, rows[1:]):
            assert a.bin_max <= b.bin_min
    finally:
        out.unpersist()


def test_quantize_int8_bounds_and_saturation(spark, sf_dir):
    out = embedding_quantize_int8(spark, sf_dir).cache()
    try:
        assert out.count() == load(spark, sf_dir, "embeddings").count()
        # symmetric quantizer: codes live in [-127, 127]
        bounds = out.agg(
            F.min("code_min").alias("lo"), F.max("code_max").alias("hi")
        ).collect()[0]
        assert bounds.lo >= -127 and bounds.hi <= 127
        # the max-|x| vector hits the scale boundary → someone saturates
        assert out.agg(F.sum("n_saturated")).collect()[0][0] >= 1
    finally:
        out.unpersist()
