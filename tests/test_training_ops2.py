"""Law tests for group-aware splits, hard-negative mining, and the
stateful streaming counter drain."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_group_aware_split_no_leakage(spark, sf_dir):
    from syllabus_sense_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5("source"), 1, 12), 16, 10).cast("bigint")
        % 10
    )
    per_source = (
        docs.select(
            "source",
            F.when(bucket < 8, "train")
            .when(bucket == 8, "val")
            .otherwise("test")
            .alias("split"),
        )
        .groupBy("source")
        .agg(F.count_distinct("split").alias("n_splits"))
        .collect()
    )
    assert per_source and all(r.n_splits == 1 for r in per_source)


def test_group_aware_split_covers_corpus(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_training10 import split_group_aware
    from syllabus_sense_spark.tables import load

    rows = {r.split: r for r in split_group_aware(spark, sf_dir).collect()}
    docs = load(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows.values()) == docs.count()
    assert set(rows) <= {"train", "val", "test"}
    assert "train" in rows and rows["train"].n_docs > 0


def test_hard_negatives_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_training10 import (
        training_hard_negatives,
    )

    rows = training_hard_negatives(spark, sf_dir).collect()
    assert rows
    per_q = {}
    for r in rows:
        assert r.negative_label != r.query_label
        per_q.setdefault(r.query_id, []).append(r)
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        sims = [r.sim_e6 for r in rs]
        assert sims == sorted(sims, reverse=True)


def test_stateful_counts_match_batch(spark, sf_dir):
    from syllabus_sense_spark.queries.streaming_queries3 import (
        streaming_stateful_counts_drain,
    )
    from syllabus_sense_spark.tables import load

    got = {
        r.user_id: (r.n_events, r.n_purchases)
        for r in streaming_stateful_counts_drain(spark, sf_dir).collect()
    }
    expect = {
        r.user_id: (r.n, r.p)
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("p"),
        )
        .collect()
    }
    assert got == expect
