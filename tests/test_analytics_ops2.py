"""Law tests for the second classic-analytics batch: pure-Python
reference replays for the iterative/windowed shapes, plus the
structural invariants the oracle hash can't express."""

from __future__ import annotations

from collections import Counter, defaultdict


def test_kcore_matches_reference_peel(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_graph5 import (
        _K,
        _N_ROUNDS,
        graph_kcore_peel,
    )
    from syllabus_sense_spark.tables import load

    items = {
        (r.l_orderkey, r.l_partkey)
        for r in load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    }
    baskets = defaultdict(set)
    for o, p in items:
        baskets[o].add(p)
    pair_cnt = Counter()
    for ps in baskets.values():
        sp = sorted(ps)
        for i, a in enumerate(sp):
            for b in sp[i + 1 :]:
                pair_cnt[(a, b)] += 1
    adj = defaultdict(set)
    for (a, b), n in pair_cnt.items():
        if n >= 2:
            adj[a].add(b)
            adj[b].add(a)
    # multigraph semantics match the query's edge-list degree, since
    # the thresholded pair list is already distinct — peel _N_ROUNDS
    for _ in range(_N_ROUNDS):
        alive = {n for n, nb in adj.items() if len(nb) >= _K}
        adj = {
            n: {m for m in nb if m in alive}
            for n, nb in adj.items()
            if n in alive
        }
        adj = {n: nb for n, nb in adj.items() if nb}
    expect = {n: len(nb) for n, nb in adj.items()}
    got = {
        r.part_key: r.degree for r in graph_kcore_peel(spark, sf_dir).collect()
    }
    assert got == expect


def test_cooccurrence_cosine_bounds(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_graph5 import (
        items_cooccurrence_cosine,
    )

    rows = items_cooccurrence_cosine(spark, sf_dir).collect()
    assert rows, "top-50 must be non-empty"
    for r in rows:
        assert r.cnt_ab <= min(r.cnt_a, r.cnt_b)
        assert 0 <= r.cos2_e6 <= 1_000_000


def test_pmi_collocation_marginals(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_text7 import text_pmi_collocations

    rows = text_pmi_collocations(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cnt_xy <= r.cnt_x and r.cnt_xy <= r.cnt_y
        assert r.lift_e6 >= 0


def test_apportionment_sums_to_budget(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_training9 import (
        _Q,
        training_quota_apportionment,
    )

    rows = training_quota_apportionment(spark, sf_dir).collect()
    assert sum(r.quota for r in rows) == _Q
    for r in rows:
        assert r.extra in (0, 1)
        assert r.quota == r.base_q + r.extra


def test_stickiness_matches_reference(spark, sf_dir):
    from syllabus_sense_spark.queries.events13 import (
        _W,
        events_stickiness_dau_wau,
    )
    from syllabus_sense_spark.queries._util import epoch_us
    from syllabus_sense_spark.tables import load

    import pyspark.sql.functions as F

    ud = {
        (r.user_id, r.us // 86_400_000_000)
        for r in load(spark, sf_dir, "events")
        .select("user_id", epoch_us(F.col("ts")).alias("us"))
        .collect()
    }
    days = sorted({d for _, d in ud})
    for row in events_stickiness_dau_wau(spark, sf_dir).collect():
        dau = len({u for u, d in ud if d == row.day})
        wau = len({u for u, d in ud if row.day - _W < d <= row.day})
        assert (row.dau, row.wau) == (dau, wau)
        assert row.wau >= row.dau
        assert row.stickiness_ppm == row.dau * 1_000_000 // row.wau
    assert len(days) > 0
