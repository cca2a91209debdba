"""Law tests for the MoM/SLA/containment batch."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_mom_growth_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.relational6 import orders_mom_growth

    rows = orders_mom_growth(spark, sf_dir).collect()
    by_prio = {}
    for r in rows:
        by_prio.setdefault(r.priority, []).append(r)
    for prio, rs in by_prio.items():
        rs.sort(key=lambda r: r.ym)
        # first month of each priority has no growth figure
        assert rs[0].growth_ppm is None
        for prev, cur in zip(rs, rs[1:]):
            if cur.growth_ppm is None:
                continue
            # sign of growth matches the count delta
            if cur.n_orders > prev.n_orders:
                assert cur.growth_ppm >= 0
            elif cur.n_orders < prev.n_orders:
                assert cur.growth_ppm < 0


def test_ship_lag_sla_ordering(spark, sf_dir):
    from syllabus_sense_spark.queries.relational6 import orders_ship_lag_sla

    for r in orders_ship_lag_sla(spark, sf_dir).collect():
        assert r.min_days <= r.p50_days <= r.p90_days <= r.max_days
        assert r.n_items > 0


def test_containment_finds_planted_superset_pairs(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_dedup5 import dedup_containment

    rows = dedup_containment(spark, sf_dir).collect()
    assert rows, "planted near-dupes must produce containment pairs"
    planted = [r for r in rows if r.doc_b == r.doc_a + 2_000_000]
    assert planted, "base→planted-dupe pairs must be detected"
    for r in planted:
        # the planted dupe is the base text + a suffix: the base's
        # (df-capped) shingles are nearly all contained in the dupe
        assert r.cont_ab_ppm >= 900_000
        assert r.n_a <= r.n_b + 2  # dupe adds shingles, never removes
    for r in rows:
        assert r.n_common <= min(r.n_a, r.n_b)
        assert 5 * r.n_common >= 4 * min(r.n_a, r.n_b)


def test_equidepth_deciles_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.events15 import events_equidepth_deciles
    from syllabus_sense_spark.tables import load

    rows = sorted(
        events_equidepth_deciles(spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    n_total = load(spark, sf_dir, "events").count()
    assert sum(r.n for r in rows) == n_total
    # equi-depth: each bucket within ±1% of n/10 at harness scales
    for r in rows:
        assert abs(r.n - n_total / 10) <= max(2, n_total * 0.01)
        assert r.lo_cents <= r.hi_cents
    # buckets tile the value range in order
    for a, b in zip(rows, rows[1:]):
        assert a.hi_cents <= b.lo_cents


def test_stratified_hamilton_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_training11 import (
        sample_stratified_hamilton,
    )

    rows = sample_stratified_hamilton(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_selected == min(r.quota, r.population)
        assert (r.n_selected == 0) == (r.id_checksum == 0) or r.n_selected > 0
