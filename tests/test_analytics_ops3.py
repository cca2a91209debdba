"""Law tests for the attribution/DQ batch: conservation and
completeness invariants the oracle hash can't express."""

from __future__ import annotations

from decimal import Decimal

import pyspark.sql.functions as F


def test_attribution_conserves_purchases(spark, sf_dir):
    from syllabus_sense_spark.queries.events14 import (
        events_attribution_last_touch,
    )
    from syllabus_sense_spark.tables import load

    rows = events_attribution_last_touch(spark, sf_dir).collect()
    purchases = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    n = purchases.count()
    cents = sum(
        int(Decimal(str(round(r.value, 2))) * 100)
        for r in purchases.select("value").collect()
    )
    assert sum(r.n_purchases for r in rows) == n
    assert sum(r.cents for r in rows) == cents
    assert all(
        r.channel in {"view", "click", "signup", "error", "(none)"}
        for r in rows
    )


def test_benford_digit_distribution(spark, sf_dir):
    from syllabus_sense_spark.queries.dq_queries4 import (
        dq_benford_first_digit,
    )
    from syllabus_sense_spark.tables import load

    rows = sorted(
        dq_benford_first_digit(spark, sf_dir).collect(),
        key=lambda r: r.first_digit,
    )
    assert [r.first_digit for r in rows] == list(range(1, 10))
    n_orders = (
        load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0).count()
    )
    assert sum(r.n for r in rows) == n_orders
    # floor-ppm can undershoot 1e6 by at most 9 units
    total_ppm = sum(r.obs_ppm for r in rows)
    assert 1_000_000 - 9 <= total_ppm <= 1_000_000
    assert sum(r.benford_ppm for r in rows) == 1_000_000


def test_profile_columns_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.dq_queries4 import (
        _PROFILE_COLS,
        dq_profile_columns,
    )

    rows = {r.col_name: r for r in dq_profile_columns(spark, sf_dir).collect()}
    assert set(rows) == set(_PROFILE_COLS)
    n_rows = rows["o_orderkey"].n_rows
    for r in rows.values():
        assert r.n_rows == n_rows
        assert 0 <= r.n_null <= n_rows
        assert 1 <= r.n_distinct <= n_rows
    # primary key: unique and never null
    assert rows["o_orderkey"].n_distinct == n_rows
    assert rows["o_orderkey"].n_null == 0
