"""[EXT] Mergeable sketches — the 100 TB pattern for distinct counts
and quantiles: build a small sketch per partition/day, STORE the
sketches, merge on demand. Re-aggregating a year of data to answer
"distinct users to date" is a full re-scan; merging 365 stored HLL
sketches is milliseconds. These queries build the per-day sketch
table and answer global questions purely by merging — the exact shape
an incremental pipeline persists.

Rows-only: sketch binaries are engine-specific (DataSketches in
Spark), so DuckDB cannot replay them; accuracy vs exact is asserted
in tests/test_sketches.py instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register


def daily_user_sketches(spark, sf_dir):
    """One HLL sketch of user_id per (day, event_type) — the stored
    incremental asset."""
    e = load(spark, sf_dir, "events")
    return e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("users_hll"))


@register("sketch_hll_distinct_users")  # rows-only: sketch binaries
def sketch_hll_distinct_users(spark, sf_dir):
    """Global + per-type distinct users answered ONLY from the daily
    sketch table (no rescan of events): merge-union then estimate."""
    daily = daily_user_sketches(spark, sf_dir)
    per_type = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("users_hll")).alias("distinct_users_est")
    )
    total = daily.agg(
        F.lit("__all__").alias("event_type"),
        F.hll_sketch_estimate(F.hll_union_agg("users_hll")).alias("distinct_users_est"),
    )
    return per_type.unionByName(total)


def merged_kll(spark, sf_dir):
    """Per-day KLL sketches folded into one merged sketch (1-row DF
    with binary column ``kll``) — shared by the quantile query and the
    rank-accuracy test."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.kll_sketch_agg_double("value").alias("value_kll")
    )
    # kll_sketch_merge_double is a binary scalar (no union aggregate
    # exists): fold the per-day sketches pairwise. The daily sketch
    # count is tiny (one row per day), so the collect_list is bounded.
    return daily.agg(F.collect_list("value_kll").alias("ks")).select(
        F.expr(
            "aggregate(slice(ks, 2, size(ks) - 1), ks[0], "
            "(acc, x) -> kll_sketch_merge_double(acc, x))"
        ).alias("kll")
    )


@register("sketch_kll_value_quantiles")  # rows-only: sketch binaries
def sketch_kll_value_quantiles(spark, sf_dir):
    """Value quantiles from merged per-day KLL sketches — same
    store-small/merge-later shape for percentiles."""
    merged = merged_kll(spark, sf_dir)
    return merged.select(
        F.round(F.kll_sketch_get_quantile_double("kll", F.lit(0.5)), 2).alias("p50"),
        F.round(F.kll_sketch_get_quantile_double("kll", F.lit(0.95)), 2).alias("p95"),
        F.round(F.kll_sketch_get_quantile_double("kll", F.lit(0.99)), 2).alias("p99"),
    )
