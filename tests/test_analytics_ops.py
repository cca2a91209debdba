"""Law tests for the classic-BI batch (each also oracle-checked via
the harness): dominance laws the value hash can't express."""

from __future__ import annotations

from decimal import Decimal


def test_pareto_frontier_undominated(spark, sf_dir):
    from syllabus_sense_spark.queries.analytics import part_pareto_frontier
    from syllabus_sense_spark.tables import load

    sky = {
        (r.p_size, r.price_cents)
        for r in part_pareto_frontier(spark, sf_dir).collect()
    }
    parts = [
        (r.p_size, int(Decimal(str(round(r.p_retailprice, 2))) * 100))
        for r in load(spark, sf_dir, "part").collect()
    ]
    # no part strictly dominates a frontier point
    for s_size, s_cents in sky:
        for p_size, p_cents in parts:
            dominates = (
                p_size >= s_size
                and p_cents <= s_cents
                and (p_size > s_size or p_cents < s_cents)
            )
            assert not dominates, (
                f"({p_size},{p_cents}) dominates frontier ({s_size},{s_cents})"
            )
    # every non-frontier size's best price is beaten by some frontier point
    assert sky, "frontier must be non-empty"


def test_revenue_concentration_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.analytics import (
        customer_revenue_concentration,
    )

    rows = sorted(
        customer_revenue_concentration(spark, sf_dir).collect(),
        key=lambda r: r.band,
    )
    assert [r.band for r in rows] == list(range(1, 11))
    shares = [r.cum_share_ppm for r in rows]
    assert shares == sorted(shares), "cumulative share must be monotone"
    assert shares[-1] == 1_000_000, "full cumsum is exactly 100%"
    # bands are equal-count within 1 (NTILE contract)
    counts = [r.n_customers for r in rows]
    assert max(counts) - min(counts) <= 1
    # revenue-DESC ranking: band revenue is non-increasing
    cents = [r.band_cents for r in rows]
    assert all(a >= b for a, b in zip(cents, cents[1:]))


def test_ab_test_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.analytics import (
        events_ab_test_proportions,
    )
    from syllabus_sense_spark.tables import load

    row = events_ab_test_proportions(spark, sf_dir).collect()[0]
    n_users = (
        load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert row.n_a + row.n_b == n_users
    assert 0 <= row.c_a <= row.n_a and 0 <= row.c_b <= row.n_b
    assert row.z2_e6 >= 0
    assert row.conv_a_ppm == row.c_a * 1_000_000 // row.n_a
