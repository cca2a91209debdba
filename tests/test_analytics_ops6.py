"""Law tests for the time-series forensics batch (CUSUM, MAD,
funnel latency, revenue waterfall)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_cusum_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.events17 import events_changepoint_cusum

    rows = sorted(
        events_changepoint_cusum(spark, sf_dir).collect(), key=lambda r: r.day
    )
    assert rows
    # deviations sum to zero ⇒ the cusum returns to zero at the end
    assert rows[-1].cusum_scaled == 0
    assert sum(r.is_changepoint for r in rows) == 1
    cp = next(r for r in rows if r.is_changepoint)
    assert abs(cp.cusum_scaled) == max(abs(r.cusum_scaled) for r in rows)


def test_mad_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.events17 import events_anomaly_mad

    rows = events_anomaly_mad(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.mad_cents >= 0
        # MAD-flagged outliers are a minority by construction
        assert r.n_outliers < r.n / 2


def test_funnel_latency_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.events17 import events_funnel_latency

    r = events_funnel_latency(spark, sf_dir).collect()[0]
    assert 0 < r.n_converted <= r.n_users
    assert 0 <= r.p50_minutes <= r.p90_minutes <= r.max_minutes


def test_waterfall_reconciles(spark, sf_dir):
    from syllabus_sense_spark.queries.relational7 import (
        orders_revenue_waterfall,
    )

    rows = {r.component: r for r in orders_revenue_waterfall(spark, sf_dir).collect()}
    assert set(rows) == {"gross", "discount_effect", "tax_effect", "net"}
    # the waterfall reconciles: gross + effects == net. The decimals
    # are exactly additive; the per-component double casts each round
    # once, so the float sum agrees to relative 1e-12.
    import math

    assert math.isclose(
        rows["gross"].amount
        + rows["discount_effect"].amount
        + rows["tax_effect"].amount,
        rows["net"].amount,
        rel_tol=1e-12,
    )
    assert rows["discount_effect"].amount < 0
    assert rows["tax_effect"].amount > 0


def test_user_streaks_reference(spark, sf_dir):
    from syllabus_sense_spark.queries.events18 import events_user_streaks
    from syllabus_sense_spark.queries._util import epoch_us
    from syllabus_sense_spark.tables import load

    ud = {}
    for r in (
        load(spark, sf_dir, "events")
        .select("user_id", epoch_us(F.col("ts")).alias("us"))
        .collect()
    ):
        ud.setdefault(r.user_id, set()).add(r.us // 86_400_000_000)
    for row in events_user_streaks(spark, sf_dir).collect():
        days = sorted(ud[row.user_id])
        islands, cur = [], [days[0]]
        for d in days[1:]:
            if d == cur[-1] + 1:
                cur.append(d)
            else:
                islands.append(cur)
                cur = [d]
        islands.append(cur)
        assert row.n_active_days == len(days)
        assert row.n_islands == len(islands)
        assert row.longest_streak == max(len(i) for i in islands)


def test_kmv_set_ops_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_sketches4 import sketch_kmv_set_ops

    r = sketch_kmv_set_ops(spark, sf_dir).collect()[0]
    assert r.n_inter_exact <= min(r.n_a_exact, r.n_b_exact)
    assert r.n_union_exact == r.n_a_exact + r.n_b_exact - r.n_inter_exact
    assert r.est_inter <= r.est_union
    # k=64 sketch: estimates within 60% of truth at harness scales
    assert abs(r.est_union - r.n_union_exact) <= 0.6 * r.n_union_exact


def test_suspected_dup_orders_conservation(spark, sf_dir):
    from syllabus_sense_spark.queries.dq_queries5 import (
        dq_suspected_duplicate_orders,
    )
    from syllabus_sense_spark.tables import load

    rows = dq_suspected_duplicate_orders(spark, sf_dir).collect()
    assert sum(r.n_orders for r in rows) == load(spark, sf_dir, "orders").count()
    for r in rows:
        assert 0 <= r.n_suspected_dups <= r.n_orders
        assert (r.n_suspected_dups == 0) <= (r.exposed_cents == 0)
