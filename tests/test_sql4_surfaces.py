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


def test_ngram_novelty_planted_dups_score_low(spark, sf_dir):
    """Exact replay of the novelty ratios on the planted corpus, and
    the planted near-dup pairs must land at the low end of novelty."""
    from syllabus_sense_spark.queries.ext_text12 import text_ngram_novelty
    from syllabus_sense_spark.queries.ext_dedup import _DUP_SUFFIX
    from syllabus_sense_spark.tables import load

    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    corpus = dict(docs)
    for d, t in docs.items():
        if d % 7 == 0:
            corpus[d + 2000000] = t + _DUP_SUFFIX

    def shingles(t):
        toks = [x for x in t.split(" ") if x]
        return {
            int(
                hashlib.md5(" ".join(toks[i : i + 3]).encode()).hexdigest()[:12], 16
            )
            for i in range(len(toks) - 2)
        }

    fp = {d: shingles(t) for d, t in corpus.items()}
    fp = {d: s for d, s in fp.items() if s}
    df: dict[int, int] = {}
    for s in fp.values():
        for h in s:
            df[h] = df.get(h, 0) + 1
    want = {}
    for d, s in fp.items():
        shared = sum(1 for h in s if df[h] >= 2)
        want[d] = (len(s), shared, (len(s) - shared) * 1_000_000 // len(s))
    got = {
        r.doc_id: (r.n_shingles, r.n_shared, r.novelty_ppm)
        for r in text_ngram_novelty(spark, sf_dir).collect()
    }
    assert got == want
    # planted dups: all but the 2 boundary shingles are shared
    dup_scores = [v[2] for d, v in want.items() if d >= 2000000]
    organic = [v[2] for d, v in want.items() if d < 2000000 and d % 7 != 0]
    assert dup_scores and organic
    assert max(dup_scores) < sorted(organic)[len(organic) // 2]


def test_retrieval_mrr_matches_leftassoc_replay(spark, sf_dir):
    """Exact integer replay: ranks from left-associated double cosine
    (the engines' shared arithmetic), metrics from integer DIV."""
    from collections import defaultdict

    from syllabus_sense_spark.queries.ml_queries6 import (
        _K,
        ml_eval_retrieval_mrr,
    )
    from syllabus_sense_spark.tables import load

    rows = load(spark, sf_dir, "embeddings").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
    labels = {r.vec_id: r.label for r in rows}

    def dot(a, b):
        s = a[0] * b[0]
        for i in range(1, len(a)):
            s = s + a[i] * b[i]
        return s

    import math

    norms = {d: math.sqrt(dot(v, v)) for d, v in vecs.items()}
    per_label = defaultdict(list)
    for qid in sorted(vecs):
        if qid % 100 != 0:
            continue
        scored = sorted(
            (
                (-dot(vecs[qid], vecs[n]) / (norms[qid] * norms[n]), n)
                for n in vecs
                if n != qid
            ),
        )
        first = next(
            (
                i + 1
                for i, (_, n) in enumerate(scored)
                if labels[n] == labels[qid]
            ),
            None,
        )
        if first is not None:
            per_label[labels[qid]].append(first)
    want = {}
    for lab, firsts in per_label.items():
        n = len(firsts)
        want[lab] = (
            n,
            sum(1 for f in firsts if f <= _K),
            sum(1_000_000 // f for f in firsts) // n,
            sum(f * 1000 for f in firsts) // n,
        )
    got = {
        r.label: (r.n_queries, getattr(r, f"hits_at_{_K}"), r.mrr_ppm, r.mean_rank_milli)
        for r in ml_eval_retrieval_mrr(spark, sf_dir).collect()
    }
    assert got == want


def test_robust_scaler_matches_sorted_replay(spark, sf_dir):
    """quantile_disc = smallest value whose cumulative rank reaches
    ceil(p*n); outliers via the doubled-integer Tukey bound."""
    import math

    from syllabus_sense_spark.queries.ml_queries6 import ml_feature_robust_scaler
    from syllabus_sense_spark.tables import load

    rows = load(spark, sf_dir, "embeddings").collect()
    dims: dict[int, list[int]] = {}
    for r in rows:
        for i, x in enumerate(r.embedding):
            dims.setdefault(i, []).append(math.floor(float(x) * 1e3 + 0.5))
    want = {}
    for i, cs in dims.items():
        cs.sort()
        n = len(cs)
        p25, p50, p75 = (cs[max(0, math.ceil(p * n) - 1)] for p in (0.25, 0.5, 0.75))
        iqr = p75 - p25
        n_out = sum(
            1 for c in cs if 2 * c < 2 * p25 - 3 * iqr or 2 * c > 2 * p75 + 3 * iqr
        )
        want[i] = (p25, p50, p75, iqr, n_out)
    got = {
        r.dim: (r.p25, r.p50, r.p75, r.iqr, r.n_outliers)
        for r in ml_feature_robust_scaler(spark, sf_dir).collect()
    }
    assert got == want


def test_curation_decisions_match_policy_replay(spark, sf_dir):
    """Exact replay of the decision table, and the policy must
    actually fire: planted near-dups are dropped as duplicates, and
    every decision's cited signals satisfy its rule."""
    from syllabus_sense_spark.queries.ext_datacard2 import (
        _DUP_NOVELTY_PPM,
        _MIN_TOKENS,
        curation_doc_decisions,
    )
    from syllabus_sense_spark.queries.ext_dedup import _DUP_SUFFIX
    from syllabus_sense_spark.tables import load

    rows = load(spark, sf_dir, "documents").select("doc_id", "lang", "text").collect()
    corpus = {r.doc_id: (r.lang, r.text) for r in rows}
    for r in rows:
        if r.doc_id % 7 == 0:
            corpus[r.doc_id + 2000000] = (r.lang, r.text + _DUP_SUFFIX)

    def shingle_set(t):
        toks = [x for x in t.split(" ") if x]
        return {
            int(hashlib.md5(" ".join(toks[i : i + 3]).encode()).hexdigest()[:12], 16)
            for i in range(len(toks) - 2)
        }

    fp = {d: shingle_set(t) for d, (_, t) in corpus.items()}
    fp = {d: s for d, s in fp.items() if s}
    df: dict[int, int] = {}
    for s in fp.values():
        for h in s:
            df[h] = df.get(h, 0) + 1
    want = {}
    for d, (lang, text) in corpus.items():
        n_tokens = len([x for x in text.split(" ") if x])
        nov = None
        if d in fp:
            s = fp[d]
            shared = sum(1 for h in s if df[h] >= 2)
            nov = (len(s) - shared) * 1_000_000 // len(s)
        if n_tokens < _MIN_TOKENS:
            dec, w = "drop_short", 0
        elif nov is not None and nov < _DUP_NOVELTY_PPM:
            dec, w = "drop_dup", 0
        elif lang != "en":
            dec, w = "downweight", 500_000
        else:
            dec, w = "keep", 1_000_000
        want[d] = (lang, n_tokens, nov, dec, w)
    got = {
        r.doc_id: (r.lang, r.n_tokens, r.novelty_ppm, r.decision, r.weight_ppm)
        for r in curation_doc_decisions(spark, sf_dir).collect()
    }
    assert got == want
    decisions = {v[3] for v in got.values()}
    assert "keep" in decisions and "drop_dup" in decisions
    # every planted dup is dropped (as dup or short), never kept
    for d, v in got.items():
        if d >= 2000000:
            assert v[3].startswith("drop"), (d, v)


def test_phash_matches_scalar_replay_and_groups(spark, sf_dir):
    """dHash replay with plain Python loops over the formula pixels
    (independent of the numpy grid code), and the groups query must
    equal a groupBy replay of the per-doc hashes."""
    from collections import Counter

    from syllabus_sense_spark.queries.ext_multimodal3 import (
        _GRID_H,
        _GRID_W,
        multimodal_phash_dedup,
        multimodal_phash_groups,
    )
    from syllabus_sense_spark.tables import load

    ids = [r.doc_id for r in load(spark, sf_dir, "documents").select("doc_id").collect()]

    def phash(d):
        w, h = 8 + d % 9, 4 + d % 5
        def gray(x, y):
            r = (d + x + y) % 256
            g = (2 * d + 3 * x + y) % 256
            b = (d + 5 * x + 7 * y) % 256
            return 299 * r + 587 * g + 114 * b
        out = 0
        for j in range(_GRID_H):
            y = (j * h) // _GRID_H
            for k in range(_GRID_W - 1):
                xa, xb = (k * w) // _GRID_W, ((k + 1) * w) // _GRID_W
                if gray(xb, y) > gray(xa, y):
                    out |= 1 << (j * 8 + k)
        return out

    want = {d: (8 + d % 9, 4 + d % 5, phash(d)) for d in ids}
    got = {
        r.doc_id: (r.width, r.height, r.phash)
        for r in multimodal_phash_dedup(spark, sf_dir).collect()
    }
    assert got == want

    counts = Counter(v[2] for v in want.values())
    want_groups = {
        ph: (n, min(d for d, v in want.items() if v[2] == ph))
        for ph, n in counts.items()
        if n >= 2
    }
    got_groups = {
        r.phash: (r.n_docs, r.canonical_doc)
        for r in multimodal_phash_groups(spark, sf_dir).collect()
    }
    assert got_groups == want_groups
    assert got_groups  # the corpus genuinely produces dup buckets


def test_histogram_drift_tvd_replay_and_bounds(spark, sf_dir):
    """Exact replay of the per-band drift shares; the truncated TVD
    (their sum) is within [0, 1e6] and counts are conserved."""
    from collections import Counter
    from datetime import date

    from syllabus_sense_spark.queries.dq_queries8 import (
        _DRIFT_BAND_CENTS,
        _DRIFT_SPLIT,
        dq_histogram_drift_tvd,
    )
    from syllabus_sense_spark.tables import load

    split = date.fromisoformat(_DRIFT_SPLIT)
    hist: dict[int, list[int]] = {}
    for r in load(spark, sf_dir, "orders").select("o_totalprice", "o_orderdate").collect():
        band = int(round(r.o_totalprice * 100)) // _DRIFT_BAND_CENTS
        half = 0 if r.o_orderdate.date() < split else 1
        hist.setdefault(band, [0, 0])[half] += 1
    t_a = sum(v[0] for v in hist.values())
    t_b = sum(v[1] for v in hist.values())
    want = {
        band: (
            v[0],
            v[1],
            abs(v[0] * t_b - v[1] * t_a) * 1_000_000 // (2 * t_a * t_b),
        )
        for band, v in hist.items()
    }
    got = {
        r.band: (r.n_first, r.n_second, r.drift_ppm)
        for r in dq_histogram_drift_tvd(spark, sf_dir).collect()
    }
    assert got == want
    tvd = sum(v[2] for v in got.values())
    assert 0 <= tvd <= 1_000_000
    assert sum(v[0] for v in got.values()) == t_a
    assert sum(v[1] for v in got.values()) == t_b


def test_aggregate_family_surfaces_replay(spark, sf_dir):
    """Python replay of the new native-aggregate queries: FILTER
    clause == conditional replay, median == sorted midpoint, boolean
    aggs == all/any, any_value == the (unique) dependent value,
    ROLLUP grouping ids label the three levels correctly."""
    from collections import defaultdict

    from syllabus_sense_spark.queries.agg_families6 import (
        agg_any_value_functional,
        agg_count_if_bools,
        agg_filter_clause,
        agg_median_exact,
        agg_rollup_grouping_id,
    )
    from syllabus_sense_spark.tables import load

    orders = load(spark, sf_dir, "orders").collect()

    # median
    cents = defaultdict(list)
    for r in orders:
        cents[r.o_orderpriority].append(int(round(r.o_totalprice * 100)))
    got = {r.o_orderpriority: (r.n_orders, r.median_cents)
           for r in agg_median_exact(spark, sf_dir).collect()}
    for k, v in cents.items():
        v.sort()
        n = len(v)
        med = float(v[n // 2]) if n % 2 else (v[n // 2 - 1] + v[n // 2]) / 2.0
        assert got[k] == (n, med)

    # booleans
    by_status = defaultdict(list)
    for r in orders:
        by_status[r.o_orderstatus].append(r.o_totalprice)
    gotb = {r.o_orderstatus: (r.n_orders, r.n_large, r.all_over_900, r.any_over_500k)
            for r in agg_count_if_bools(spark, sf_dir).collect()}
    for k, v in by_status.items():
        assert gotb[k] == (
            len(v),
            sum(1 for x in v if x > 100000),
            all(x > 900 for x in v),
            any(x > 500000 for x in v),
        )

    # any_value: functional dependence -> must equal the customer name
    names = {r.c_custkey: r.c_name
             for r in load(spark, sf_dir, "customer").collect()}
    for r in agg_any_value_functional(spark, sf_dir).collect():
        assert r.customer_name == names[r.o_custkey]
        assert r.n_orders >= 10

    # grouping ids: level 0 = leaves, 1 = per-flag, 3 = grand total
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").collect()
    rows = agg_rollup_grouping_id(spark, sf_dir).collect()
    by_level = defaultdict(list)
    for r in rows:
        by_level[r.level_id].append(r)
    assert set(by_level) == {0, 1, 3}
    assert len(by_level[3]) == 1 and by_level[3][0].n_items == len(li)
    assert sum(r.n_items for r in by_level[0]) == len(li)
    assert sum(r.n_items for r in by_level[1]) == len(li)
    assert all(r.linestatus == "<all>" for r in by_level[1])

    # FILTER clause == conditional replay
    flt = {r.l_returnflag: (r.n_discounted, r.n_return_suppliers)
           for r in agg_filter_clause(spark, sf_dir).collect()}
    li2 = load(spark, sf_dir, "lineitem").collect()
    disc = defaultdict(int)
    rsup = defaultdict(set)
    for r in li2:
        if r.l_discount > 0.05:
            disc[r.l_returnflag] += 1
        if r.l_returnflag == "R":
            rsup[r.l_returnflag].add(r.l_suppkey)
    for k, (nd, ns) in flt.items():
        assert nd == disc[k]
        assert ns == len(rsup[k]) if k == "R" else ns == 0


def test_scalar_batch5_semantics(spark, sf_dir):
    """printf zero-pad/hex semantics, base64 round trip is total, and
    the levenshtein histogram masses every consecutive pair."""
    from syllabus_sense_spark.queries.scalar_funcs5 import (
        scalar_base64_roundtrip,
        scalar_levenshtein_bands,
        scalar_printf_format,
    )
    from syllabus_sense_spark.tables import load

    for r in scalar_printf_format(spark, sf_dir).collect():
        status, pad, hexpart = r.tag.split("|")
        assert len(pad) == 3 and pad.isdigit()
        assert int(hexpart, 16) < 16
        assert r.n >= 2

    rows = scalar_base64_roundtrip(spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert all(r.n_roundtrip_ok == r.n_docs for r in rows)  # bijection

    lev = scalar_levenshtein_bands(spark, sf_dir).collect()
    ids = sorted(
        r.doc_id for r in load(spark, sf_dir, "documents").select("doc_id").collect()
    )
    n_pairs = sum(1 for a, b in zip(ids, ids[1:]) if b == a + 1)
    assert sum(r.n_pairs for r in lev) == n_pairs
    assert all(0 <= r.dist <= 10 for r in lev)


def test_locf_and_rank_tie_semantics(spark, sf_dir):
    """LOCF replay: per user in time order, filled value == most
    recent purchase cents (NULL before the first); rank jumps after
    ties while dense_rank stays contiguous."""
    from collections import defaultdict

    from syllabus_sense_spark.queries.windows6 import (
        events_locf_forward_fill,
        window_dense_rank_ties,
    )
    from syllabus_sense_spark.tables import load

    ev = defaultdict(list)
    for r in load(spark, sf_dir, "events").collect():
        ev[r.user_id].append((r.ts, r.event_id, r.event_type, r.value))
    want = {}
    for u, rows in ev.items():
        rows.sort(key=lambda t: (t[0], t[1]))
        cur, unfilled, total = None, 0, 0
        for _, _, et, val in rows:
            if et == "purchase":
                cur = int(round(val * 100))
            if cur is None:
                unfilled += 1
            else:
                total += cur
        want[u] = (len(rows), unfilled, total)
    got = {
        r.user_id: (r.n_events, r.n_unfilled, r.sum_filled_cents)
        for r in events_locf_forward_fill(spark, sf_dir).collect()
    }
    assert got == want

    rows = window_dense_rank_ties(spark, sf_dir).collect()
    by_flag = defaultdict(list)
    for r in rows:
        by_flag[r.l_returnflag].append(r)
    for flag, rs in by_flag.items():
        rs.sort(key=lambda r: r.band)
        # dense ranks are 1..k contiguous; rank = 1 + rows preceding
        seen = 0
        for i, r in enumerate(rs):
            assert r.dense_rank == i + 1
            assert r.first_rank == seen + 1
            seen += r.n_tied
        assert any(r.n_tied >= 2 for r in rs)  # ties actually occur


def test_map_higher_order_pipeline_replay(spark, sf_dir):
    """Scalar replay of the map pipeline: per order, the three fees
    through the rate zip and the filter; aggregates match exactly."""
    from collections import defaultdict

    from syllabus_sense_spark.queries.scalar_funcs6 import (
        map_higher_order_pipeline,
    )
    from syllabus_sense_spark.tables import load

    agg = defaultdict(lambda: [0, 0])
    for r in load(spark, sf_dir, "orders").select("o_totalprice").collect():
        c = int(round(r.o_totalprice * 100))
        fees = {"base": c, "tax": (c * 7) // 100, "ship": c // 50}
        rates = {"base": 100, "tax": 107, "ship": 102}
        for k, chg in fees.items():
            v = (chg * rates[k]) // 100
            if v >= 500000:
                agg[k][0] += 1
                agg[k][1] += v
    got = {
        r.fee: (r.n_fees, r.total_cents)
        for r in map_higher_order_pipeline(spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}
    assert "base" in got  # the filter keeps large fees


def test_dynamic_gap_sessionize_replay_and_bracketing(spark, sf_dir):
    """Python interval-merge replay of the dynamic-gap sessions, plus
    bracketing: session count sits between the all-60m and all-30m
    fixed-gap counts (longer gaps merge more)."""
    from collections import defaultdict

    from syllabus_sense_spark.queries.events24 import (
        events_sessionize_dynamic_gap,
    )
    from syllabus_sense_spark.tables import load

    ev = defaultdict(list)
    for r in load(spark, sf_dir, "events").collect():
        us = int(r.ts.timestamp() * 1_000_000)
        gap = 3_600_000_000 if r.event_type == "purchase" else 1_800_000_000
        ev[r.user_id].append((us, r.event_id, gap, r.event_type, r.value))

    def sessions(rows, fixed=None):
        rows = sorted(rows)
        out, cur = [], None
        for us, _, gap, et, val in rows:
            g = fixed if fixed is not None else gap
            if cur is None or us >= cur["end"]:
                if cur:
                    out.append(cur)
                cur = {"start": us, "end": us + g, "n": 0, "p": 0, "v": 0.0}
            cur["end"] = max(cur["end"], us + g)
            cur["n"] += 1
            cur["p"] += et == "purchase"
            cur["v"] += val
        if cur:
            out.append(cur)
        return out

    want = {}
    n_dyn = n_30 = n_60 = 0
    for u, rows in ev.items():
        ss = sessions(rows)
        n_dyn += len(ss)
        n_30 += len(sessions(rows, fixed=1_800_000_000))
        n_60 += len(sessions(rows, fixed=3_600_000_000))
        for s in ss:
            want[(u, s["start"])] = (s["end"], s["n"], s["p"])
    got = {}
    for r in events_sessionize_dynamic_gap(spark, sf_dir).collect():
        start = int(r.session_start.timestamp() * 1_000_000)
        end = int(r.session_end.timestamp() * 1_000_000)
        got[(r.user_id, start)] = (end, r.n_events, r.n_purchases)
    assert got == want
    assert n_60 <= n_dyn <= n_30
    assert n_60 < n_30  # the two gap tiers genuinely differ here


def test_streaming_dynamic_gap_equals_batch_twin(spark, sf_dir):
    """The drained streaming dynamic-gap sessions must equal the batch
    session_window form row-for-row (state-store merging across
    micro-batches == one-shot batch merging)."""
    from syllabus_sense_spark.queries.events24 import (
        events_sessionize_dynamic_gap,
    )
    from syllabus_sense_spark.queries.streaming_queries5 import (
        streaming_dynamic_gap_drain,
    )

    stream_rows = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.n_purchases)
        for r in streaming_dynamic_gap_drain(spark, sf_dir).collect()
    }
    batch_rows = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.n_purchases)
        for r in events_sessionize_dynamic_gap(spark, sf_dir).collect()
    }
    assert stream_rows == batch_rows
    assert stream_rows


def test_audio_fingerprint_scalar_replay(spark, sf_dir):
    """Scalar-loop replay of the audio sign-of-delta fingerprint from
    the PCM formula (independent of the numpy grid code)."""
    from syllabus_sense_spark.queries.ext_multimodal3 import (
        _AFP_POINTS,
        multimodal_audio_fingerprint,
    )
    from syllabus_sense_spark.tables import load

    ids = [r.doc_id for r in load(spark, sf_dir, "documents").select("doc_id").collect()]

    def afp(d):
        n = 64 + d % 64
        def s(i):
            return (d * 31 + i * 17) % 65536 - 32768
        out = 0
        for k in range(_AFP_POINTS - 1):
            ga, gb = (k * n) // _AFP_POINTS, ((k + 1) * n) // _AFP_POINTS
            if s(gb) > s(ga):
                out |= 1 << k
        return out

    want = {d: (64 + d % 64, afp(d)) for d in ids}
    got = {
        r.doc_id: (r.n_samples, r.afp)
        for r in multimodal_audio_fingerprint(spark, sf_dir).collect()
    }
    assert got == want


def test_phash_near_pairs_pigeonhole_complete(spark, sf_dir):
    """Candidate generation is complete: EVERY distinct-hash pair with
    Hamming <= 6 appears (pigeonhole over 7 bands guarantees it — the
    brute-force check over distinct hashes proves no pair is lost)."""
    from itertools import combinations

    from syllabus_sense_spark.queries.ext_multimodal3 import (
        _PHASH_HAMMING_MAX,
        multimodal_phash_dedup,
        multimodal_phash_near_pairs,
    )

    hashes = sorted(
        {r.phash for r in multimodal_phash_dedup(spark, sf_dir).collect()}
    )
    want = {
        (a, b, bin(a ^ b).count("1"))
        for a, b in combinations(hashes, 2)
        if bin(a ^ b).count("1") <= _PHASH_HAMMING_MAX
    }
    got = {
        (r.ph_a, r.ph_b, r.hamming)
        for r in multimodal_phash_near_pairs(spark, sf_dir).collect()
    }
    assert got == want
    assert want  # near pairs genuinely exist in the corpus
