"""Laws for the round-7 Spark-4 SQL surfaces (recursive CTEs,
SQL-language functions, collation) and the Merkle table fingerprint."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def test_recursive_month_spine_is_gap_free(spark, sf_dir):
    from syllabus_sense_spark.queries.spark4_features7 import (
        sql_recursive_month_spine,
    )
    from syllabus_sense_spark.tables import load

    rows = sql_recursive_month_spine(spark, sf_dir).collect()
    months = sorted(r.month for r in rows)
    # contiguous: every month between min and max appears exactly once
    y0, m0 = map(int, months[0].split("-"))
    y1, m1 = map(int, months[-1].split("-"))
    expect = []
    y, m = y0, m0
    while (y, m) <= (y1, m1):
        expect.append(f"{y:04d}-{m:02d}")
        m += 1
        if m == 13:
            y, m = y + 1, 1
    assert months == expect
    # conservation: per-month counts sum to the table count and every
    # order month is inside the spine
    o = load(spark, sf_dir, "orders")
    assert sum(r.n_orders for r in rows) == o.count()
    assert all(r.n_orders >= 0 and r.rev_cents >= 0 for r in rows)


def test_recursive_chain_depth_is_digit_count(spark, sf_dir):
    from syllabus_sense_spark.queries.spark4_features7 import (
        sql_recursive_custkey_chain,
    )

    rows = sql_recursive_custkey_chain(spark, sf_dir).collect()
    assert rows
    for r in rows:
        k = r.c_custkey
        # walking k -> k DIV 10 -> ... -> 0 takes exactly len(str(k))
        # steps for k > 0
        assert r.chain_len == (len(str(k)) if k > 0 else 0)
        # ancestors are the proper decimal prefixes; they can't
        # outnumber the digits
        assert 0 <= r.n_real_anc <= r.chain_len


def test_sql_function_is_inlined_no_python_udf(spark, sf_dir):
    from syllabus_sense_spark.queries.spark4_features7 import (
        sql_create_function_margin,
    )

    df = sql_create_function_margin(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # SQL-language fn inlines; no UDF node
    # and equals the hand-inlined expression
    from syllabus_sense_spark.tables import load

    li = load(spark, sf_dir, "lineitem")
    direct = {
        r.l_returnflag: (r.n, r.rev)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
                * (
                    100
                    - (F.col("l_discount").cast("decimal(4,2)") * 100).cast("bigint")
                )
            )
            .cast("bigint")
            .alias("rev"),
        )
        .collect()
    }
    got = {r.l_returnflag: (r.n_items, r.rev_microcents) for r in df.collect()}
    assert got == direct


def test_tvf_bands_cover_all_orders(spark, sf_dir):
    from syllabus_sense_spark.queries.spark4_features7 import (
        sql_table_function_price_bands,
        _BAND_WIDTH_CENTS,
        _N_BANDS,
    )
    from syllabus_sense_spark.tables import load

    rows = sql_table_function_price_bands(spark, sf_dir).collect()
    assert len(rows) == _N_BANDS
    for r in rows:
        assert r.hi_cents - r.lo_cents == _BAND_WIDTH_CENTS
        assert r.lo_cents == r.band * _BAND_WIDTH_CENTS
    assert sum(r.n_orders for r in rows) == load(spark, sf_dir, "orders").count()


def test_collation_ci_bounds_and_equivalence(spark, sf_dir):
    from syllabus_sense_spark.queries.spark4_features7 import (
        sql_collation_ci_distinct,
    )
    from syllabus_sense_spark.tables import load

    row = sql_collation_ci_distinct(spark, sf_dir).collect()[0]
    assert 1 <= row.n_keys_ci <= row.n_keys_cs <= row.n_rows
    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        F.when(
            F.col("doc_id") % 3 == 0, F.upper(F.substring("text", 1, 12))
        )
        .otherwise(F.substring("text", 1, 12))
        .alias("k")
    )
    assert row.n_keys_cs == keyed.distinct().count()
    assert row.n_keys_ci == keyed.select(F.lower("k")).distinct().count()
    # the perturbation actually exercises the collation (cs > ci)
    assert row.n_keys_cs > row.n_keys_ci


def test_table_fingerprint_matches_python_replay(spark, sf_dir):
    from syllabus_sense_spark.queries.dq_queries8 import (
        _N_BUCKETS,
        dq_table_fingerprint,
    )
    from syllabus_sense_spark.tables import load

    got = {
        r.bucket: (r.n_rows, r.xor_digest, r.sum_digest)
        for r in dq_table_fingerprint(spark, sf_dir).collect()
    }
    want: dict[int, list[int]] = {}
    for r in load(spark, sf_dir, "orders").collect():
        cents = int(
            (r.o_totalprice * 100).__round__()
        )  # doubles here are exact cents by construction
        canon = "|".join(
            [
                str(r.o_orderkey),
                str(r.o_custkey),
                r.o_orderstatus,
                str(cents),
                str(r.o_orderdate.date()),
                r.o_orderpriority,
            ]
        )
        d = int(hashlib.md5(canon.encode()).hexdigest()[:12], 16)
        b = r.o_orderkey % _N_BUCKETS
        st = want.setdefault(b, [0, 0, 0])
        st[0] += 1
        st[1] ^= d
        st[2] += d
    assert got == {b: tuple(v) for b, v in want.items()}
