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


# Queries with no CORRECTNESS row after rounds 1-2 (the driver checks
# the first 50 registered per round). These register first in round 3
# so that, combined with r01's 50 relational/window rows and r02's 50
# ext/pipeline rows, every registered query carries driver evidence.
# The one re-check in the list is pack_sequences_greedy (r02 hash fail,
# oracle HUGEINT cast fixed in ext_training2.py).
_ROUND3_PRIORITY = [
    "pack_sequences_greedy",
    # -- oracle-ready, never checked --
    "pipeline_union_accumulate",
    "pipeline_limit_topics",
    "events_tumbling_hourly",
    "events_sessionize_gap30m",
    "events_asof_last_order",
    "events_asof_inner",
    "events_sliding_windows",
    "events_sliding_window_agg",
    "events_session_window_native",
    "events_rollup_daily_from_hourly",
    "events_latest_per_key",
    "events_session_capped",
    "events_cohort_retention",
    "events_funnel_sequential",
    "events_interval_join_views",
    "events_gapfill_forward",
    "events_histogram_bins",
    "scd2_user_status",
    "scd2_point_in_time",
    "string_functions",
    "datetime_functions",
    "math_functions",
    "array_explode_token_counts",
    "array_ops_slice_distinct",
    "json_extract_props",
    "map_functions",
    "struct_functions",
    "json_roundtrip",
    "date_arithmetic",
    "null_handling_functions",
    "union_by_name_missing",
    "array_posexplode_tokens",
    "try_functions_safe_arith",
    "window_distinct_users_running",
    "array_explode_outer_keepempty",
    "q2_min_cost_supplier",
    "q11_important_supply_value",
    "q20_excess_volume_suppliers",
    "q16_supplier_part_counts",
    "recursive_month_series",
    "join_null_safe_eq",
    "subquery_scalar_in_select",
    # -- rows-only, never checked --
    "pipeline_extract_subtopics",
    "pipeline_plan_questions",
    "pipeline_flagship_questions",
    "text_lang_id_heuristic",
    "docx_parse_topics",
    "ml_minhash_lsh_dupes",
    "similarity_ivf_kmeans",
]


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
        ext_training,
        ext_training2,
        ext_web,
        ext_similarity2,
        spark4_features,
        dq_queries,
        agg_families,
        agg_families2,
        ext_sketches,
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

    order = [n for n in _ROUND3_PRIORITY if n in QUERIES] + [
        n for n in QUERIES if n not in _ROUND3_PRIORITY
    ]
    for registry in (QUERIES, ORACLE):
        reordered = {n: registry[n] for n in order if n in registry}
        registry.clear()
        registry.update(reordered)
