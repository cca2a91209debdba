"""Partitioning invariance: registered queries must produce the
IDENTICAL result multiset under a different shuffle width — the
property that makes results reproducible when a cluster rescales
(32 reducers here, 2000 there). Catches any accidental dependence on
partition count: rand()/monotonically_increasing_id leakage,
first()/limit-without-order, float reduction order.

A representative slice is exercised (one per family: scan-agg, LSH
dedup, iterative BPE, windowed ordered-statistic, hash sampling,
sketch) — the whole registry's determinism is separately enforced by
the DuckDB oracle hash at sf0.01, but that runs at ONE width; this
test is the second axis.
"""

from __future__ import annotations

QUERIES = [
    "q1_pricing_summary",
    "dedup_minhash_lsh",
    "training_bpe_merges",
    "agg_weighted_median",
    "sample_reservoir_per_group",
    "sketch_kmv_distinct",
    # round-6 continuation families: plan→execute sampling
    # composition, bounded-expansion rolling distinct, sliding
    # ordered statistic, iterative Lloyd, containment dedup
    "sample_stratified_hamilton",
    "events_stickiness_dau_wau",
    "window_moving_median",
    "cluster_kmeans_1d_prices",
    "dedup_containment",
]


def _rows(spark, name, sf_dir):
    from syllabus_sense_spark import queries as q

    q.load_all_queries()
    df = q.QUERIES[name](spark, sf_dir)
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_results_survive_shuffle_width_change(spark, sf_dir):
    width = spark.conf.get("spark.sql.shuffle.partitions")
    baseline = {n: _rows(spark, n, sf_dir) for n in QUERIES}
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        for n in QUERIES:
            assert _rows(spark, n, sf_dir) == baseline[n], n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", width)
