"""Law tests for the round-5 operators (each also oracle-checked via
the harness; these assert the structural invariants the hash can't
express)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_repeated_passages_bounds_and_planted_dups(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_text5 import dedup_repeated_passages
    from syllabus_sense_spark.tables import load

    rows = dedup_repeated_passages(spark, sf_dir).collect()
    assert rows, "synthetic corpus plants near-duplicates; expect hits"
    for r in rows:
        assert 0 < r.n_repeated <= r.n_grams
        assert r.rep_ppm == r.n_repeated * 1_000_000 // r.n_grams
        assert r.rep_ppm <= 1_000_000
    # exact duplicate documents must surface with full coverage: any
    # doc whose text equals another doc's text repeats every 8-gram.
    d = load(spark, sf_dir, "documents")
    dup_ids = {
        r.doc_id
        for r in (
            d.groupBy("text")
            .agg(F.collect_list("doc_id").alias("ids"), F.count(F.lit(1)).alias("n"))
            .filter(
                (F.col("n") >= 2) & (F.size(F.split("text", " ")) >= 8)
            )
            .select(F.explode("ids").alias("doc_id"))
            .collect()
        )
    }
    full = {r.doc_id for r in rows if r.rep_ppm == 1_000_000}
    assert dup_ids <= full


def test_pagerank_integer_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_graph2 import (
        _SUPP_OFFSET,
        graph_pagerank_trade,
    )
    from syllabus_sense_spark.tables import load

    rows = graph_pagerank_trade(spark, sf_dir).collect()
    assert rows
    # node set = every customer/supplier that traded, exactly once
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    traded = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    custs = {r.o_custkey for r in traded.select("o_custkey").distinct().collect()}
    supps = {
        r.l_suppkey + _SUPP_OFFSET
        for r in traded.select("l_suppkey").distinct().collect()
    }
    got = [r.node for r in rows]
    assert len(got) == len(set(got))
    assert set(got) == custs | supps
    # damping floor: every node keeps at least the teleport mass, and
    # total mass never exceeds the initial total (integer division
    # only loses mass, never creates it)
    for r in rows:
        assert r.rank_micro >= 150_000
    assert sum(r.rank_micro for r in rows) <= len(rows) * 1_000_000
    # deterministic on rerun (pure integer arithmetic)
    again = {r.node: r.rank_micro for r in graph_pagerank_trade(spark, sf_dir).collect()}
    assert again == {r.node: r.rank_micro for r in rows}


def test_triangle_census_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_graph3 import graph_triangle_census

    rows = graph_triangle_census(spark, sf_dir).collect()
    # total participation is 3 per triangle, so it divides by 3
    total = sum(r.n_triangles for r in rows)
    assert total % 3 == 0
    for r in rows:
        assert r.n_triangles >= 1
    # deterministic on rerun
    again = sorted(map(tuple, graph_triangle_census(spark, sf_dir).collect()))
    assert again == sorted(map(tuple, rows))


def test_temperature_mixture_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_training5 import (
        training_temperature_mixture,
    )

    rows = training_temperature_mixture(spark, sf_dir).collect()
    assert rows
    total_docs = sum(r.n_docs for r in rows)
    target = total_docs // 2
    tot_w = sum(r.weight for r in rows)
    for r in rows:
        assert 0 <= r.n_sampled <= r.n_docs
        assert 0 <= r.rate_ppm <= 1_000_000
        expect = min(1_000_000, target * r.weight * 1_000_000 // (tot_w * r.n_docs))
        assert r.rate_ppm == expect
        # weight is the floor of an exact sqrt on the char mass
        assert r.weight * r.weight <= r.mass < (r.weight + 1) * (r.weight + 1)
    # deterministic on rerun
    again = sorted(map(tuple, training_temperature_mixture(spark, sf_dir).collect()))
    assert again == sorted(map(tuple, rows))


def test_streaming_interval_join_equals_batch(spark, sf_dir):
    from pyspark.sql import functions as F  # noqa: F811

    from syllabus_sense_spark.queries.streaming_queries2 import (
        streaming_interval_join_drain,
    )
    from syllabus_sense_spark.tables import load

    got = {
        tuple(r)
        for r in streaming_interval_join_drain(spark, sf_dir).collect()
    }
    e = load(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = {
        tuple(r)
        for r in v.join(
            p,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") > F.col("view_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")
            ),
        )
        .select("view_id", "purchase_id", "user_id", "view_ts", "purchase_ts")
        .collect()
    }
    assert got == batch


def test_grouped_agg_udaf_median_laws(spark, sf_dir):
    from pyspark.sql import functions as F  # noqa: F811

    from syllabus_sense_spark.queries.ext_udaf import pandas_udaf_median_value
    from syllabus_sense_spark.tables import load

    rows = {r.event_type: r for r in pandas_udaf_median_value(spark, sf_dir).collect()}
    ref = {
        r.event_type: r
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(F.expr("percentile(value, 0.5)") * F.lit(1e6))
            .cast("bigint")
            .alias("med_e6"),
        )
        .collect()
    }
    assert rows.keys() == ref.keys()
    for et, r in rows.items():
        assert r.n_events == ref[et].n
        # JVM percentile(0.5) is the same two-middle average
        assert r.median_value_e6 == ref[et].med_e6
    # order-independence: same result under a different partitioning
    repart = {
        r.event_type: r.median_value_e6
        for r in pandas_udaf_median_value(spark, sf_dir).collect()
    }
    assert repart == {et: r.median_value_e6 for et, r in rows.items()}


def test_incremental_rollup_query_equals_direct(spark, sf_dir):
    from pyspark.sql import functions as F  # noqa: F811

    from syllabus_sense_spark.queries.incremental_queries import (
        incremental_rollup_daily,
    )
    from syllabus_sense_spark.tables import load

    got = {
        (r.day, r.event_type): (r.n_events, r.total_value)
        for r in incremental_rollup_daily(spark, sf_dir).collect()
    }
    direct = {
        (r.day, r.event_type): (r.n, r.tv)
        for r in load(spark, sf_dir, "events")
        .groupBy(
            F.col("ts").cast("date").alias("day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("tv"),
        )
        .collect()
    }
    assert got == direct


def test_skew_profile_partitions_rows_and_keys(spark, sf_dir):
    from syllabus_sense_spark.queries.dq_queries2 import dq_join_skew_profile
    from syllabus_sense_spark.tables import load

    rows = dq_join_skew_profile(spark, sf_dir).collect()
    li = load(spark, sf_dir, "lineitem")
    li_rows = [r for r in rows if r.rel == "lineitem.l_orderkey"]
    assert sum(r.n_rows for r in li_rows) == li.count()
    assert sum(r.n_keys for r in li_rows) == li.select("l_orderkey").distinct().count()
    for r in rows:
        # the bucket's max really lives in [2^b, 2^(b+1))
        assert 2**r.bucket_log2 <= r.max_rows_per_key < 2 ** (r.bucket_log2 + 1)
