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
