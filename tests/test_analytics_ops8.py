"""Law tests for the cluster-report / feature-hashing / diversity /
rank-movers batch."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_cluster_report_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_dedup7 import dedup_cluster_report

    rows = dedup_cluster_report(spark, sf_dir).collect()
    assert rows, "planted dupes must form clusters"
    for r in rows:
        assert r.cluster_size >= 2
        assert r.canonical_doc == r.component_id  # min-label components
        assert r.min_chars <= r.max_chars
        assert r.total_chars >= r.cluster_size * r.min_chars


def test_feature_hashing_conserves_tokens(spark, sf_dir):
    from syllabus_sense_spark.queries.ml_queries2 import (
        _N_BUCKETS,
        ml_feature_hashing_vectors,
    )
    from syllabus_sense_spark.tables import load

    rows = ml_feature_hashing_vectors(spark, sf_dir).collect()
    assert all(0 <= r.bucket < _N_BUCKETS for r in rows)
    # total hashed counts == total tokens of the selected docs
    n_tokens = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select(
            F.size(
                F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
            ).alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert sum(r.cnt for r in rows) == n_tokens


def test_simpson_diversity_bounds(spark, sf_dir):
    from syllabus_sense_spark.queries.ml_queries2 import (
        events_user_diversity_simpson,
    )

    rows = events_user_diversity_simpson(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # Simpson ∈ [1/n_types, 1]; floor-scaling may undershoot by 1
        assert r.simpson_ppm <= 1_000_000
        assert r.simpson_ppm >= 1_000_000 // r.n_types - 1
        if r.n_types == 1:
            assert r.simpson_ppm == 1_000_000


def test_rank_movers_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.windows4 import window_rank_movers

    rows = window_rank_movers(spark, sf_dir).collect()
    assert rows
    by_month = {}
    for r in rows:
        by_month.setdefault(r.midx, []).append(r)
        if r.prev_rank is not None:
            assert r.rank_gain == r.prev_rank - r.rnk
    for midx, rs in by_month.items():
        ranks = sorted(r.rnk for r in rs)
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 20


def test_upsert_versioned_batch_invariance(spark, sf_dir):
    """The LWW merge gives the same table whether changes arrive in
    one batch or many — the property that makes the streaming drain
    hash-checkable."""
    import os
    import tempfile

    from syllabus_sense_spark.sinks.upsert import upsert_versioned
    from syllabus_sense_spark.tables import load
    from syllabus_sense_spark.queries._util import epoch_us

    rows = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        epoch_us(F.col("ts")).alias("us"),
        "event_id",
    )

    def run(split_mod):
        path = os.path.join(tempfile.mkdtemp(prefix="lww_inv_"), "t")
        for part in range(split_mod):
            batch = rows.filter(F.col("event_id") % split_mod == part)
            upsert_versioned(
                spark, path, batch,
                key_cols=["user_id", "event_type"],
                version_cols=["us", "event_id"],
                partition_col="event_type",
            )
        return {
            (r.user_id, r.event_type): (r.us, r.event_id)
            for r in spark.read.parquet(path).collect()
        }

    assert run(1) == run(3)
