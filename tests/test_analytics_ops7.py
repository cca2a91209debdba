"""Law tests for the dynamic-SQL / entity-composite / manifest batch."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_execute_immediate_matches_inline(spark, sf_dir):
    from syllabus_sense_spark.queries.spark4_features3 import (
        sql_execute_immediate_params,
    )
    from syllabus_sense_spark.tables import load

    got = {
        r.priority: (r.n_orders, r.cents)
        for r in sql_execute_immediate_params(spark, sf_dir).collect()
    }
    expect = {
        r.priority: (r.n, r.cents)
        for r in load(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 50000))
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .collect()
    }
    assert got == expect


def test_substitution_candidates_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.relational8 import (
        part_substitution_candidates,
    )

    rows = part_substitution_candidates(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.part_a < r.part_b
        assert 10 * abs(r.cents_a - r.cents_b) <= r.cents_b


def test_supplier_scorecard_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.relational8 import supplier_scorecard
    from syllabus_sense_spark.tables import load

    rows = supplier_scorecard(spark, sf_dir).collect()
    n_items = sum(r.n_items for r in rows)
    assert n_items == load(spark, sf_dir, "lineitem").count()
    for r in rows:
        assert 0 <= r.return_ppm <= 1_000_000
        assert r.revenue_cents > 0


def test_dataset_manifest_consistent_with_split(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_training10 import split_group_aware
    from syllabus_sense_spark.queries.ext_training12 import (
        training_dataset_manifest,
    )

    man = {r.split: r for r in training_dataset_manifest(spark, sf_dir).collect()}
    split = {r.split: r for r in split_group_aware(spark, sf_dir).collect()}
    assert set(man) == set(split)
    for k in man:
        assert man[k].n_docs == split[k].n_docs
        assert man[k].n_sources == split[k].n_sources
        assert man[k].total_bytes == split[k].total_chars
        assert man[k].min_doc_id <= man[k].max_doc_id
