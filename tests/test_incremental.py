"""Incremental rollup: only new partitions processed; result always
equals the full recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from syllabus_sense_spark.operators.incremental import incremental_rollup
from syllabus_sense_spark.tables import load


def _agg(df):
    return df.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


def test_incremental_rollup_only_new_partitions(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events_by_day")
    rollup = str(tmp_path / "rollup")

    e = load(spark, sf_dir, "events").withColumn("day", F.to_date("ts").cast("string"))
    days = sorted(r.day for r in e.select("day").distinct().collect())
    assert len(days) >= 3
    first, rest = days[: len(days) // 2], days[len(days) // 2 :]

    e.filter(F.col("day").isin(first)).write.partitionBy("day").mode(
        "overwrite"
    ).parquet(src)

    # Run 1 processes exactly the initial days.
    assert incremental_rollup(spark, src, rollup, "day", _agg) == first
    # Run 2 is a no-op: already current.
    assert incremental_rollup(spark, src, rollup, "day", _agg) == []

    # New days land; run 3 processes only those.
    e.filter(F.col("day").isin(rest)).write.partitionBy("day").mode(
        "append"
    ).parquet(src)
    assert incremental_rollup(spark, src, rollup, "day", _agg) == rest

    spark.catalog.clearCache()
    # Partition-type inference reads `day` back as DATE; normalize.
    got = {
        (str(r.day), r.event_type): (r.n_events, r.n_users)
        for r in spark.read.parquet(rollup).collect()
    }
    want = {
        (str(r.day), r.event_type): (r.n_events, r.n_users)
        for r in _agg(e).collect()
    }
    assert got == want
