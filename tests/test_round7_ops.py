"""Law tests for the round-7 operators: preference-pair / best-of-n
selection (pure-Python reference replay) and the structural
invariants the value hash can't express (pair distinctness, draw-set
membership), plus regression laws for the round-7 artifact rewrites
(containment grouped expansion ≡ join form on a micro corpus).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _scored_docs(spark, sf_dir):
    from syllabus_sense_spark.tables import load

    rows = load(spark, sf_dir, "documents").select(
        "lang", "source", "doc_id", "text"
    ).collect()
    out = []
    for r in rows:
        toks = {t for t in r.text.split() if t}
        out.append((r.lang, r.source, r.doc_id, len(toks)))
    return out


def test_preference_pairs_match_reference(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_training14 import (
        training_preference_pairs,
    )

    got = {
        (r.lang, r.source): r
        for r in training_preference_pairs(spark, sf_dir).collect()
    }
    groups: dict[tuple, list] = {}
    for lang, source, doc_id, score in _scored_docs(spark, sf_dir):
        groups.setdefault((lang, source), []).append((score, doc_id))
    for key, docs in groups.items():
        if len(docs) < 2:
            assert key not in got
            continue
        chosen = max(docs)
        rejected = min(docs)
        row = got[key]
        assert (row.chosen_score, row.chosen_doc) == chosen
        assert (row.rejected_score, row.rejected_doc) == rejected
        assert row.margin == chosen[0] - rejected[0]
        # A pair never degenerates to one document.
        assert row.chosen_doc != row.rejected_doc
    assert set(got) == {k for k, v in groups.items() if len(v) >= 2}


def test_best_of_n_draws_then_picks(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_training14 import (
        _N_DRAW,
        training_best_of_n,
    )

    got = {
        (r.lang, r.source): r for r in training_best_of_n(spark, sf_dir).collect()
    }
    groups: dict[tuple, list] = {}
    for lang, source, doc_id, score in _scored_docs(spark, sf_dir):
        draw = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        groups.setdefault((lang, source), []).append((draw, doc_id, score))
    for key, docs in groups.items():
        drawn = sorted(docs)[:_N_DRAW]
        best = max((score, doc_id) for _, doc_id, score in drawn)
        row = got[key]
        assert row.n_drawn == min(len(docs), _N_DRAW)
        assert (row.best_score, row.best_doc) == best
        # The pick must come from the drawn subset, not the full pool.
        assert row.best_doc in {doc_id for _, doc_id, _ in drawn}


def test_random_projection_matches_python_replay(spark, sf_dir):
    """The Rademacher projection must equal a pure-Python replay of
    floor-scale-then-signed-sum over the same embeddings, and the SRP
    bucket of every vector must be the sign pattern of its projection."""
    import math

    from syllabus_sense_spark.queries.ext_similarity3 import (
        _OUT_DIM,
        _SELS,
        embedding_random_projection,
        similarity_srp_buckets,
    )
    from syllabus_sense_spark.tables import load

    rows = load(spark, sf_dir, "embeddings").collect()
    want = {}
    buckets: dict[int, list[int]] = {}
    for r in rows:
        codes = [math.floor(float(x) * 1e6 + 0.5) for x in r.embedding]
        proj = [
            sum((1 if t > 0 else -1) * codes[abs(t) - 1] for t in _SELS[j])
            for j in range(_OUT_DIM)
        ]
        want[r.vec_id] = proj
        b = sum((1 << j) for j in range(_OUT_DIM) if proj[j] >= 0)
        buckets.setdefault(b, []).append(r.label)
    got = embedding_random_projection(spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        proj = want[r.vec_id]
        assert [getattr(r, f"proj_{j}") for j in range(_OUT_DIM)] == proj
        assert r.l1_micro == sum(abs(p) for p in proj)
    srp = {r.bucket: r for r in similarity_srp_buckets(spark, sf_dir).collect()}
    assert set(srp) == set(buckets)
    for b, labels in buckets.items():
        r = srp[b]
        assert r.n_vecs == len(labels)
        assert r.n_labels == len(set(labels))
        top = max((labels.count(l), l) for l in set(labels))
        assert (r.top_label_cnt, r.top_label) == top


def test_token_budget_waterfill_laws(spark, sf_dir):
    """Waterfill invariants + pure-Python replay: allocations never
    exceed caps, the residual equals B - Σalloc, redistribution only
    ever adds budget, and every row matches a reference replay of the
    two unrolled rounds."""
    from syllabus_sense_spark.queries.ext_training15 import (
        training_token_budget_epochs,
    )
    from syllabus_sense_spark.tables import load

    rows = load(spark, sf_dir, "documents").select("source", "text").collect()
    per = {}
    for r in rows:
        toks = len([t for t in r.text.split() if t])
        d, t = per.get(r.source, (0, 0))
        per[r.source] = (d + 1, t + toks)
    tiers = {
        s: [1, 2, 4][int(hashlib.md5(s.encode()).hexdigest()[:2], 16) % 3]
        for s in per
    }
    W = sum(d for d, _ in per.values())
    B = 2 * sum(t for _, t in per.values())
    cap = {s: tiers[s] * t for s, (_, t) in per.items()}
    alloc = {s: min(B * d // W, cap[s]) for s, (d, _) in per.items()}
    for _ in range(2):
        pool = B - sum(alloc.values())
        wu = sum(per[s][0] for s in per if alloc[s] < cap[s])
        if wu:
            alloc = {
                s: min(
                    alloc[s]
                    + (pool * per[s][0] // wu if alloc[s] < cap[s] else 0),
                    cap[s],
                )
                for s in per
            }
    got = {r.source: r for r in training_token_budget_epochs(spark, sf_dir).collect()}
    assert set(got) == set(per)
    # Some sources must cap and some must not, or the fill is trivial.
    assert 0 < sum(r.is_capped for r in got.values()) < len(got)
    for s, r in got.items():
        assert (r.docs, r.total_tokens) == per[s]
        assert r.tier == tiers[s]
        assert r.alloc_tokens == alloc[s] <= cap[s]
        assert r.epochs_milli == alloc[s] * 1000 // per[s][1]
        assert r.is_capped == int(alloc[s] == cap[s])
        assert r.residual_budget == B - sum(alloc.values()) >= 0


def test_scripting_bisect_finds_lower_median(spark, sf_dir):
    """The SQL-scripting bisection must return the exact lower median
    (smallest value whose rank reaches ceil(n/2)) of the cents column."""
    from syllabus_sense_spark.queries.spark4_features4 import (
        sql_scripting_median_bisect,
    )
    from syllabus_sense_spark.tables import load

    cents = sorted(
        r.c
        for r in load(spark, sf_dir, "orders")
        .selectExpr("CAST(o_totalprice * 100 AS BIGINT) AS c")
        .collect()
    )
    row = sql_scripting_median_bisect(spark, sf_dir).collect()[0]
    assert row.n_orders == len(cents)
    assert row.median_cents == cents[(len(cents) + 1) // 2 - 1]


def test_state_reader_matches_batch_counts(spark, sf_dir):
    """The checkpoint state read back via the statestore source must
    equal the exact batch GROUP BY — no lost or duplicated updates."""
    from collections import Counter

    from syllabus_sense_spark.queries.spark4_features4 import (
        streaming_state_reader,
    )
    from syllabus_sense_spark.tables import load

    want = Counter(
        r.event_type
        for r in load(spark, sf_dir, "events").select("event_type").collect()
    )
    got = {
        r.event_type: r.n_events
        for r in streaming_state_reader(spark, sf_dir).collect()
    }
    assert got == dict(want)


def test_curriculum_stage_boundaries_and_keys(spark, sf_dir):
    """Stages must be the exact quartile bucketing of the integer
    difficulty score, and schedule keys the md5 replay."""
    from syllabus_sense_spark.queries.ext_training16 import (
        training_curriculum_stages,
    )
    from syllabus_sense_spark.tables import load

    rows = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    ).collect()
    diff = {}
    for r in rows:
        n_toks = len([t for t in r.text.split() if t])
        if n_toks > 0:
            diff[r.doc_id] = r.n_chars * 1000 // n_toks
    vals = sorted(diff.values())

    def q(p):
        # percentile_disc: smallest value at or above rank ceil(p*n)
        import math

        return vals[max(0, math.ceil(p * len(vals)) - 1)]

    q1, q2, q3 = q(0.25), q(0.50), q(0.75)
    got = {r.doc_id: r for r in training_curriculum_stages(spark, sf_dir).collect()}
    assert set(got) == set(diff)
    for doc_id, d in diff.items():
        r = got[doc_id]
        assert r.difficulty_milli == d
        assert r.stage == 1 + (d > q1) + (d > q2) + (d > q3)
        want_key = int(
            hashlib.md5(f"cur:{doc_id}".encode()).hexdigest()[:12], 16
        )
        assert r.schedule_key == want_key
    # All four stages populated, and stage sizes within quartile slack.
    from collections import Counter

    sizes = Counter(r.stage for r in got.values())
    assert set(sizes) == {1, 2, 3, 4}


def test_priority_sampling_matches_dlt_replay(spark, sf_dir):
    """Per-lang top-k by the integer Duffield-Lund-Thorup priority
    (w << 20) / (1 + h20) must match a pure-Python replay."""
    from syllabus_sense_spark.queries.ext_training16 import (
        _K,
        sample_priority_wor,
    )
    from syllabus_sense_spark.tables import load

    rows = load(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars"
    ).collect()
    groups: dict[str, list] = {}
    for r in rows:
        w = max(r.n_chars, 1)
        u = 1 + int(hashlib.md5(f"pri:{r.doc_id}".encode()).hexdigest()[:5], 16)
        groups.setdefault(r.lang, []).append((w * 1048576 // u, r.doc_id, w))
    want = set()
    for lang, items in groups.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        for rnk, (p, doc_id, w) in enumerate(items[:_K], start=1):
            want.add((lang, doc_id, w, p, rnk))
    got = {
        (r.lang, r.doc_id, r.weight, r.priority, r.rnk)
        for r in sample_priority_wor(spark, sf_dir).collect()
    }
    assert got == want


def test_bfs_levels_match_python_replay(spark, sf_dir):
    """3-hop multi-source BFS must equal a pure-Python BFS over the
    same trade graph, including which nodes stay unreached."""
    from syllabus_sense_spark.queries.ext_graph7 import (
        _HOPS,
        _SUPP_OFFSET,
        graph_bfs_levels,
    )
    from syllabus_sense_spark.tables import load

    orders = {
        r.o_orderkey: r.o_custkey
        for r in load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey"
        ).collect()
    }
    pairs = {
        (orders[r.l_orderkey], r.l_suppkey)
        for r in load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey"
        ).collect()
        if r.l_orderkey in orders
    }
    adj: dict[int, set[int]] = {}
    for c, s in pairs:
        adj.setdefault(c, set()).add(s + _SUPP_OFFSET)
        adj.setdefault(s + _SUPP_OFFSET, set()).add(c)
    level = {c: 0 for c, _ in pairs if c % 100 == 1}
    frontier = dict(level)
    for d in range(1, _HOPS + 1):
        nxt = {}
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in level:
                    nxt[v] = d
        level.update(nxt)
        frontier = nxt
    got = {r.node: r.level for r in graph_bfs_levels(spark, sf_dir).collect()}
    assert got == level
    assert set(level.values()) >= {0, 1, 2}


def test_bloom_runtime_filter_injected_and_scoped(spark, sf_dir):
    """Under the scoped confs the optimizer must inject the runtime
    bloom filter (bloom_filter_agg on the build side, might_contain on
    the probe scan); after the query runs, every conf must be back to
    its prior value."""
    from syllabus_sense_spark.queries.relational12 import (
        _CONFS,
        bloom_joined,
        join_bloom_runtime_filter,
        scoped_confs,
    )

    before = {k: spark.conf.get(k, None) for k in _CONFS}
    with scoped_confs(spark, _CONFS):
        plan = (
            bloom_joined(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    after = {k: spark.conf.get(k, None) for k in _CONFS}
    assert after == before
    # The registered query materializes then restores — same check.
    rows = join_bloom_runtime_filter(spark, sf_dir).collect()
    assert {k: spark.conf.get(k, None) for k in _CONFS} == before
    assert rows and all(r.n_items > 0 for r in rows)


def test_docx_pushdown_contracts(spark):
    """pushFilters must claim only the two supported equalities, path
    equality must prune partitions at planning, type equality must
    drop rows at parse, and the pushed scan must equal the unpushed
    one (transparency)."""
    import os

    from pyspark.sql.datasource import EqualTo, GreaterThan

    from syllabus_sense_spark.queries.relational12 import scoped_confs
    from syllabus_sense_spark.queries.source_queries3 import (
        _FIXTURE,
        _PUSH_CONF,
    )
    from syllabus_sense_spark.sources.docx_datasource import (
        DocxDataSourceReader,
        register_docx_source,
    )

    if not os.path.exists(_FIXTURE):
        import pytest

        pytest.skip("reference fixture unavailable")

    r = DocxDataSourceReader({"path": os.path.dirname(_FIXTURE)})
    fs = [
        EqualTo(("path",), _FIXTURE),
        EqualTo(("element_type",), "table"),
        GreaterThan(("element_idx",), 5),
    ]
    unsupported = list(r.pushFilters(fs))
    assert unsupported == [fs[2]]  # only the range filter handed back
    assert [p.path for p in r.partitions()] == [_FIXTURE]
    rows = list(r.read(r.partitions()[0]))
    assert rows and all(t[2] == "table" for t in rows)

    # Path equality that matches nothing prunes to zero partitions.
    r2 = DocxDataSourceReader({"path": os.path.dirname(_FIXTURE)})
    r2.pushFilters([EqualTo(("path",), "/nonexistent.docx")])
    assert r2.partitions() == []

    # End-to-end transparency: pushed and unpushed scans agree.
    register_docx_source(spark)
    q = (
        spark.read.format("docx")
        .load(os.path.dirname(_FIXTURE))
        .filter(F.col("element_type") == "paragraph")
        .select("element_idx", "text")
    )
    with scoped_confs(spark, _PUSH_CONF):
        pushed = sorted((r.element_idx, r.text) for r in q.collect())
    unpushed = sorted((r.element_idx, r.text) for r in q.collect())
    assert pushed == unpushed and len(pushed) == 29


def test_arrow_cogroup_covers_one_sided_keys(spark, sf_dir):
    """The cogrouped Arrow combine must behave FULL OUTER: keys with
    only orders or only events still produce a row, with zero counts
    on the absent side."""
    from syllabus_sense_spark.queries.spark4_features5 import (
        arrow_cogroup_order_event_stats,
    )
    from syllabus_sense_spark.tables import load

    got = {
        r.user_id: (r.n_orders, r.n_events)
        for r in arrow_cogroup_order_event_stats(spark, sf_dir).collect()
    }
    custs = {
        r.o_custkey
        for r in load(spark, sf_dir, "orders").select("o_custkey").collect()
    }
    users = {
        r.user_id
        for r in load(spark, sf_dir, "events").select("user_id").collect()
    }
    assert set(got) == custs | users
    only_orders = custs - users
    only_events = users - custs
    assert only_orders or only_events  # the outer shape is exercised
    for k in only_orders:
        assert got[k][1] == 0 and got[k][0] > 0
    for k in only_events:
        assert got[k][0] == 0 and got[k][1] > 0


def test_udtf_analyze_polymorphic_schema(spark, sf_dir):
    """analyze() must derive the output schema from the literal stat
    list: asking for 'cnt,max' produces a schema WITHOUT sum_cents,
    and the per-partition results must match the batch GROUP BY."""
    from pyspark.sql.functions import udtf

    from syllabus_sense_spark.queries.spark4_features6 import _make_udtf
    from syllabus_sense_spark.tables import load

    spark.udtf.register("partition_stats_t", udtf(_make_udtf()))
    load(spark, sf_dir, "orders").selectExpr(
        "o_custkey AS user_id",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents",
    ).createOrReplaceTempView("_udtf_orders_cents_t")
    out = spark.sql(
        "SELECT * FROM partition_stats_t("
        "TABLE(_udtf_orders_cents_t) PARTITION BY (user_id), 'cnt,max')"
    )
    assert out.columns == ["user_id", "cnt", "max_cents"]
    got = {r.user_id: (r.cnt, r.max_cents) for r in out.collect()}
    want = {
        r.user_id: (r.cnt, r.mx)
        for r in spark.sql(
            "SELECT user_id, COUNT(*) AS cnt, MAX(cents) AS mx"
            " FROM _udtf_orders_cents_t GROUP BY user_id"
        ).collect()
    }
    assert got == want
    # Unknown stat names must fail at PLAN time (inside analyze).
    import pytest

    with pytest.raises(Exception, match="unknown stat"):
        spark.sql(
            "SELECT * FROM partition_stats_t("
            "TABLE(_udtf_orders_cents_t) PARTITION BY (user_id), 'median')"
        ).collect()


def test_pca_power_iteration_matches_replay_and_rayleigh_law(spark, sf_dir):
    """The integer power-iteration output must equal a pure-Python
    big-int replay exactly; and each power step must increase the
    Rayleigh quotient of the (PSD) scaled covariance — the theorem
    power iteration rests on, valid at ANY eigengap (the harness
    embeddings are near-isotropic, lambda1/lambda2 ~ 1.07, so
    two steps do NOT converge to the top eigenvector and a
    numpy-alignment assertion would be wrong by construction)."""
    import math

    import numpy as np

    from syllabus_sense_spark.queries.ml_queries5 import (
        _SCALE,
        ml_pca_power_iteration,
    )
    from syllabus_sense_spark.tables import load

    X = [
        [math.floor(float(x) * 1e3 + 0.5) for x in r.embedding]
        for r in load(spark, sf_dir, "embeddings").collect()
    ]
    n, d = len(X), len(X[0])
    S = [sum(row[i] for row in X) for i in range(d)]
    P = [[sum(row[i] * row[j] for row in X) for j in range(d)] for i in range(d)]
    G = [[n * P[i][j] - S[i] * S[j] for j in range(d)] for i in range(d)]
    v1 = [sum(G[i]) for i in range(d)]
    v2 = [sum(G[i][j] * v1[j] for j in range(d)) for i in range(d)]
    m = max(abs(v) for v in v2)
    want = {
        i: (1 if v2[i] >= 0 else -1) * (abs(v2[i]) * _SCALE // m)
        for i in range(d)
    }
    got = {
        r.dim: r.ratio_ppm for r in ml_pca_power_iteration(spark, sf_dir).collect()
    }
    assert got == want

    # Rayleigh monotonicity: R(G, G^k u) is nondecreasing in k for
    # PSD G (Golub & Van Loan §8.2). G here is N^2 * covariance.
    Gm = np.array(G, dtype=float)
    assert np.allclose(Gm, Gm.T)
    assert np.linalg.eigvalsh(Gm).min() > -1e-3 * abs(Gm).max()

    def rayleigh(v):
        v = np.asarray(v, dtype=float)
        return (v @ Gm @ v) / (v @ v)

    ones = np.ones(d)
    r0, r1, r2 = rayleigh(ones), rayleigh(v1), rayleigh(v2)
    assert r1 >= r0 * (1 - 1e-12)
    assert r2 >= r1 * (1 - 1e-12)
    # and the reported integer direction is (up to scaling) v2:
    ours = np.array([got[i] for i in range(d)], dtype=float)
    v2f = np.array(v2, dtype=float)
    cos = abs(ours @ v2f) / (np.linalg.norm(ours) * np.linalg.norm(v2f))
    assert cos > 1 - 1e-9, cos


def test_containment_grouped_expansion_equals_join_form(spark):
    """The round-7 C(df,2) array expansion must reproduce the naive
    h-equi-self-join candidate counts exactly (duplicates, ordering,
    df cap) on a corpus small enough to brute-force."""
    from syllabus_sense_spark.queries.ext_dedup5 import _DF_CAP

    fp = spark.createDataFrame(
        [(d, h) for d in range(12) for h in range(6) if (d * 7 + h * 3) % 4 != 1],
        "doc_id long, h long",
    )
    grp = (
        fp.groupBy("h")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
        .filter(F.size("docs") <= _DF_CAP)
        .select("docs")
    )
    pair_expr = (
        "flatten(transform(docs, (x, i) -> "
        "transform(slice(docs, i + 2, size(docs)), "
        "y -> struct(x AS doc_a, y AS doc_b))))"
    )
    got = (
        grp.select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy("p.doc_a", "p.doc_b")
        .count()
        .collect()
    )
    a = fp.select(F.col("doc_id").alias("doc_a"), "h")
    b = fp.select(F.col("doc_id").alias("doc_b"), "h")
    want = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .count()
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_importance_selection_matches_replay_and_enriches_target(spark, sf_dir):
    """Exact big-int replay of the DSIR-style rational scores, and the
    selected set must over-represent the target domain (lang='en')
    relative to the corpus — the point of importance selection."""
    from collections import Counter

    from syllabus_sense_spark.queries.ext_training17 import (
        _SCALE,
        _TOP_K,
        training_importance_selection,
    )
    from syllabus_sense_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text").collect()
    toks = {r.doc_id: [t for t in r.text.split(" ") if t] for r in docs}
    lang = {r.doc_id: r.lang for r in docs}
    c_r = Counter(t for ts in toks.values() for t in ts)
    c_t = Counter(
        t for d, ts in toks.items() if lang[d] == "en" for t in ts
    )
    t_r, t_t = sum(c_r.values()), sum(c_t.values())
    scores = {}
    for d, ts in toks.items():
        num = sum(c_t.get(t, 0) for t in ts)
        den = sum(c_r[t] for t in ts)
        scores[d] = (num * t_r * _SCALE) // (den * t_t)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:_TOP_K]
    got = [
        (r.doc_id, r.score_ppm)
        for r in training_importance_selection(spark, sf_dir).collect()
    ]
    assert got == want

    sel_en = sum(1 for d, _ in got if lang[d] == "en") / len(got)
    corpus_en = sum(1 for v in lang.values() if v == "en") / len(lang)
    assert sel_en > corpus_en
