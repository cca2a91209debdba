"""Salted-join equivalence + stateful streaming dedupe parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from syllabus_sense_spark.operators.skew import salted_join
from syllabus_sense_spark.streaming.stateful import stream_first_seen_dedupe
from syllabus_sense_spark.tables import load


def test_salted_join_matches_plain_join(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = (
        l.join(o, "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    salted = (
        salted_join(l, o, on="l_orderkey", salt=8)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {(r.o_orderpriority, r.n) for r in plain} == {
        (r.o_orderpriority, r.n) for r in salted
    }


def test_stateful_first_seen_dedupe(spark, sf_dir):
    q = stream_first_seen_dedupe(spark, sf_dir, query_name="t_firstseen")
    q.awaitTermination(180)
    streamed = {
        (r.user_id, r.event_type): r.first_event_id
        for r in spark.sql("SELECT * FROM t_firstseen").collect()
    }
    e = load(spark, sf_dir, "events")
    batch = {
        (r.user_id, r.event_type): r.first_event_id
        for r in e.groupBy("user_id", "event_type")
        .agg(F.min("event_id").alias("first_event_id"))
        .collect()
    }
    assert streamed == batch
