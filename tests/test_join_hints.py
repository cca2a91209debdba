"""Join-strategy control surface: hints must steer the physical plan.

At 100 TB the engine's job is often to OVERRIDE the planner — force a
shuffled-hash join when sort-merge's sort would spill, or forbid a
broadcast the stats wrongly suggest. These tests pin that the control
surface works on this Spark build."""

from __future__ import annotations

from pyspark.sql import functions as F

from syllabus_sense_spark.tables import load


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_broadcast_hint_forces_bhj(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    plan = _plan(o.join(F.broadcast(c), o.o_custkey == c.c_custkey))
    assert "BroadcastHashJoin" in plan


def test_shuffle_hash_hint_forces_shj(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").hint("shuffle_hash")
    plan = _plan(o.join(c, o.o_custkey == c.c_custkey))
    assert "ShuffledHashJoin" in plan


def test_merge_hint_forces_smj(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    # without the hint AQE would broadcast the small side at this sf
    c = load(spark, sf_dir, "customer").hint("merge")
    plan = _plan(o.join(c, o.o_custkey == c.c_custkey))
    assert "SortMergeJoin" in plan


def test_runtime_bloom_filter_injects_on_selective_join(spark, sf_dir):
    """Runtime-filter posture for the 100 TB deployment: a selective
    filter on the build side injects a bloom filter into the probe-side
    scan, pruning shuffle input before the join. The size thresholds
    that gate injection are sized for real clusters (probe side >=
    10 GB), so the test lowers them to demonstrate the capability at
    harness scale; result equality against the unfiltered plan is
    asserted too."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        l = load(spark, sf_dir, "lineitem")
        o = load(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = l.join(o, l.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        assert "bloom_filter_agg" in _plan(j)
        with_bloom = {(r.o_orderpriority, r.n) for r in j.collect()}
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    plain = (
        load(spark, sf_dir, "lineitem")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert with_bloom == {(r.o_orderpriority, r.n) for r in plain.collect()}
