"""Bucketed co-located join: correctness AND the plan guarantee —
no Exchange (shuffle) on either side of the join."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from syllabus_sense_spark.operators.bucketing import bucketed_join, write_bucketed
from syllabus_sense_spark.tables import load


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", str(tmp_path / "o"), "o_orderkey", 8)
    write_bucketed(lineitem, "b_lineitem", str(tmp_path / "l"), "o_orderkey", 8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_is_shuffle_free(spark, bucketed_pair):
    lt, rt = bucketed_pair
    # Force the large×large planning regime: at test scale Spark would
    # broadcast the tiny side (which bypasses bucketed scans entirely);
    # at 100 TB neither side broadcasts and bucket co-location is what
    # removes the shuffle.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, on="o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"
    assert "Bucketed: true" in plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_pair):
    lt, rt = bucketed_pair
    bucketed = (
        bucketed_join(spark, lt, rt, on="o_orderkey")
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    plain = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )
