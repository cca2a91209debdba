"""Law tests for the robust-stats wave (stats_queries /
agg_families5 / events23 / ext_text11)."""

from __future__ import annotations


def test_bootstrap_ci_laws(spark, sf_dir):
    from pyspark.sql import functions as F

    from syllabus_sense_spark.queries.stats_queries import (
        _N_REPS,
        stat_bootstrap_poisson_ci,
    )
    from syllabus_sense_spark.tables import load

    (r,) = stat_bootstrap_poisson_ci(spark, sf_dir).collect()
    assert r.n_replicates == _N_REPS
    assert (
        r.min_cents
        <= r.ci_lo_cents
        <= r.ci_mid_cents
        <= r.ci_hi_cents
        <= r.max_cents
    )
    # the replicate means bracket the plain mean (weights average 1)
    purch = load(spark, sf_dir, "events").filter("event_type = 'purchase'")
    (m,) = purch.agg(
        F.expr(
            "CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("mean_cents")
    ).collect()
    # CI should be tight around the truth: ±10% is generous for n≥1000
    assert r.min_cents <= m.mean_cents * 1.1
    assert r.max_cents >= m.mean_cents * 0.9
    assert r.ci_lo_cents <= m.mean_cents <= r.ci_hi_cents


def test_poisson_weight_distribution(spark, sf_dir):
    """The hashed weights actually follow Poisson(1): mean weight within
    a few percent of 1 across all replicate-rows."""
    from pyspark.sql import functions as F

    from syllabus_sense_spark.queries.stats_queries import (
        _C,
        _A,
        _N_REPS,
        _P,
        _WEIGHT_SQL,
    )
    from syllabus_sense_spark.tables import load

    purch = (
        load(spark, sf_dir, "events")
        .filter("event_type = 'purchase'")
        .select((F.col("event_id") % _P).alias("id"))
    )
    reps = F.array(
        *[
            F.struct(F.lit(_A[b]).alias("a"), F.lit(_C[b]).alias("c"))
            for b in range(_N_REPS)
        ]
    )
    w = (
        purch.select("id", F.explode(reps).alias("r"))
        .select(F.expr(f"((id + r.c) % {_P}) * r.a % {_P}").alias("u"))
        .select(F.expr(_WEIGHT_SQL).alias("w"))
    )
    stats = w.agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("ws")
    ).collect()[0]
    assert 0.93 < stats.ws / stats.n < 1.07


def test_trimmed_winsorized_ordering(spark, sf_dir):
    from syllabus_sense_spark.queries.agg_families5 import (
        agg_trimmed_winsorized,
    )
    from syllabus_sense_spark.tables import load

    rows = agg_trimmed_winsorized(spark, sf_dir).collect()
    n = load(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == n
    for r in rows:
        assert r.p5_cents <= r.p95_cents
        # all three means live inside the cutoff interval
        for m in (r.mean_cents, r.trimmed_mean_cents, r.winsorized_mean_cents):
            assert r.p5_cents <= m <= r.p95_cents or r.mean_cents == m
        # winsorizing clamps: its mean is between trimmed-interval
        # bounds too
        assert r.p5_cents <= r.winsorized_mean_cents <= r.p95_cents


def test_daily_peaks_are_local_maxima(spark, sf_dir):
    from syllabus_sense_spark.queries.events23 import events_daily_peaks
    from syllabus_sense_spark.queries.events22 import _US_PER_DAY  # noqa: F401
    from syllabus_sense_spark.tables import load
    from pyspark.sql import functions as F

    peaks = events_daily_peaks(spark, sf_dir).collect()
    assert peaks
    daily = {}
    rows = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            (F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000)
            .cast("bigint")
            .alias("day"),
        )
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    for r in rows:
        daily[(r.event_type, r.day)] = r["count"]
    for p in peaks:
        assert p.prominence >= 1
        neigh = [
            daily.get((p.event_type, p.day + o), 0) for o in (-2, -1, 1, 2)
        ]
        # row-neighbor semantics: calendar neighbors are a superset
        # only when days are dense; peaks must at least beat the
        # calendar-adjacent days that exist
        assert p.cnt == daily[(p.event_type, p.day)]
        assert p.cnt > daily.get((p.event_type, p.day - 1), 0) or (
            (p.event_type, p.day - 1) not in daily
        )


def test_quantile_shift_consistency(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_text11 import (
        text_length_quantile_shift,
    )
    from syllabus_sense_spark.tables import load

    rows = text_length_quantile_shift(spark, sf_dir).collect()
    sources = {
        r.source
        for r in load(spark, sf_dir, "documents")
        .select("source")
        .distinct()
        .collect()
    }
    assert {r.source for r in rows} == sources
    by_src = {}
    for r in rows:
        assert r.shift == r.src_len - r.pooled_len
        by_src.setdefault(r.source, {})[r.decile] = r
    pooled = None
    for src, ds in by_src.items():
        assert set(ds) == set(range(1, 10))
        # deciles are monotone within both distributions
        for d in range(1, 9):
            assert ds[d].src_len <= ds[d + 1].src_len
            assert ds[d].pooled_len <= ds[d + 1].pooled_len
        p = tuple(ds[d].pooled_len for d in range(1, 10))
        assert pooled is None or p == pooled  # same pooled row everywhere
        pooled = p
