"""Law tests for the moving-median / pipe-SQL / Zipf / basket /
share-tree batch."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_moving_median_reference(spark, sf_dir):
    from syllabus_sense_spark.queries.windows5 import (
        _W,
        window_moving_median,
    )

    rows = window_moving_median(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: (r.us, r.event_id))
        for i, r in enumerate(rs):
            win = sorted(x.cents for x in rs[max(0, i - _W + 1) : i + 1])
            assert r.n_in_window == len(win)
            assert r.moving_median_cents == win[(len(win) + 1) // 2 - 1]


def test_pipe_sql_matches_classic(spark, sf_dir):
    from syllabus_sense_spark.queries.spark4_features3 import (
        sql_pipe_syntax_rollup,
    )
    from syllabus_sense_spark.tables import load

    got = {
        r.l_returnflag: (r.n_items, r.total_qty)
        for r in sql_pipe_syntax_rollup(spark, sf_dir).collect()
    }
    expect = {
        r.l_returnflag: (r.n, r.q)
        for r in load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= "1996-01-01")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("q"),
        )
        .collect()
    }
    assert got == expect


def test_zipf_profile_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_text9 import text_zipf_profile

    rows = sorted(text_zipf_profile(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    freqs = [r.freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    assert all(r.rank_freq_product == r.rank * r.freq for r in rows)


def test_basket_histogram_conserves_orders(spark, sf_dir):
    from syllabus_sense_spark.queries.relational10 import (
        orders_basket_size_histogram,
    )
    from syllabus_sense_spark.tables import load

    rows = orders_basket_size_histogram(spark, sf_dir).collect()
    n_orders_with_lines = (
        load(spark, sf_dir, "lineitem").select("l_orderkey").distinct().count()
    )
    assert sum(r.n_orders for r in rows) == n_orders_with_lines
    assert sum(r.n_lines * r.n_orders for r in rows) == load(
        spark, sf_dir, "lineitem"
    ).count()


def test_share_hierarchy_sums(spark, sf_dir):
    from syllabus_sense_spark.queries.relational10 import sales_share_hierarchy

    rows = sales_share_hierarchy(spark, sf_dir).collect()
    by_region = {}
    for r in rows:
        by_region.setdefault(r.region, []).append(r)
    for region, rs in by_region.items():
        total_ppm = sum(r.share_of_region_ppm for r in rs)
        assert 1_000_000 - len(rs) <= total_ppm <= 1_000_000
        # region share is identical on every row of the region
        assert len({r.region_share_ppm for r in rs}) == 1
    region_total = sum(
        rs[0].region_share_ppm for rs in by_region.values()
    )
    assert 1_000_000 - len(by_region) <= region_total <= 1_000_000


def test_link_prediction_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_graph3 import copurchase_pairs
    from syllabus_sense_spark.queries.ext_graph6 import graph_link_prediction

    rows = graph_link_prediction(spark, sf_dir).collect()
    assert rows
    edges = {
        (r.pa, r.pb)
        for r in copurchase_pairs(spark, sf_dir)
        .groupBy("pa", "pb")
        .count()
        .filter(F.col("count") >= 2)
        .collect()
    }
    for r in rows:
        assert r.part_a < r.part_b
        assert (r.part_a, r.part_b) not in edges, "predicted link must be new"
        assert r.common_nbrs >= 1
        assert r.common_nbrs <= min(r.deg_a, r.deg_b)


def test_stopword_candidates_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_text9 import text_stopword_candidates
    from syllabus_sense_spark.tables import load

    rows = text_stopword_candidates(spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert rows
    for r in rows:
        assert 10 * r.doc_freq >= n_docs
        assert r.df_ppm == r.doc_freq * 1_000_000 // n_docs
        assert r.is_stopword_candidate == (1 if 2 * r.doc_freq >= n_docs else 0)


def test_pack_efficiency_consistent_with_packing(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_training2 import (
        _PACK_CAPACITY,
        pack_sequences_greedy,
    )
    from syllabus_sense_spark.queries.ext_training13 import (
        training_pack_efficiency,
    )

    r = training_pack_efficiency(spark, sf_dir).collect()[0]
    packed = pack_sequences_greedy(spark, sf_dir)
    assert r.total_tokens == packed.agg(F.sum("n_tok")).collect()[0][0]
    n_seqs = packed.select("source", "pack_id").distinct().count()
    assert r.n_sequences == n_seqs
    assert 1 <= r.min_docs_per_seq <= r.max_docs_per_seq
    assert (
        r.fill_ppm
        == r.total_tokens * 1_000_000 // (n_seqs * _PACK_CAPACITY)
    )


def test_dispersion_matches_reference(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_training13 import (
        events_dispersion_test,
    )
    from syllabus_sense_spark.queries._util import epoch_us
    from syllabus_sense_spark.tables import load

    r = events_dispersion_test(spark, sf_dir).collect()[0]
    days = {}
    for row in (
        load(spark, sf_dir, "events")
        .select(epoch_us(F.col("ts")).alias("us"))
        .collect()
    ):
        d = row.us // 86_400_000_000
        days[d] = days.get(d, 0) + 1
    xs = list(days.values())
    n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
    assert (r.n_days, r.total_events) == (n, sx)
    import math

    assert r.dispersion_e6 == math.floor(
        float(n * sxx - sx * sx) * 1e6 / (float(n) * float(sx))
    )
