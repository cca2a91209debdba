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
# this round, or (c) no past CORRECTNESS_r*.json shows them green.
# Everything already green registers afterwards (harmless
# re-confirmation when slots remain).
_FORCE_RECHECK = [
    # round-4 fixes invalidating earlier rows:
    "events_sessionize_gap30m",  # r03 err: TIMESTAMP_NTZ vs unix_micros
    "events_session_capped",  # r03 err: same
    "events_rollup_daily_from_hourly",  # r03 hash: SUM(BIGINT)->HUGEINT
    "q2_min_cost_supplier",  # r03 hash: decimal col Arrow metadata
    "pipeline_extract_subtopics",  # r03 err: ndarray in driver canon
    "pipeline_flagship_questions",  # r03 err: same
    "q12_priority_by_band",  # r01 hash: HUGEINT cast (fixed r02, unchecked)
    "pivot_status_counts",  # r01 hash: same
    "text_lang_id_heuristic",  # upgraded rows-only -> oracle in round 4
    "pipeline_plan_questions",  # output scalarized in round 4
]

_NEW_THIS_ROUND: list[str] = []


def prioritize(*names: str) -> None:
    """Mark queries added/changed this round for front-of-line checks."""
    for n in names:
        if n not in _NEW_THIS_ROUND:
            _NEW_THIS_ROUND.append(n)


def _greens_from_past_rounds() -> set[str]:
    """Names with green driver evidence in any CORRECTNESS_r*.json:
    hash-green for oracle queries, rows-recorded for rows-only ones."""
    import glob
    import json
    import os

    green: set[str] = set()
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            data = json.load(open(path))
        except Exception:
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True:
                green.add(name)
            elif row.get("err") == "no_oracle" and row.get("spark_rows"):
                green.add(name)
    return green


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
        ext_text4,
        ext_pq,
        ext_semdedup,
        ext_training3,
        ext_dedup2,
        streaming_queries,
        scalar_funcs3,
        events6,
        ext_training4,
        events7,
        relational5,
        ext_search,
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

    green = _greens_from_past_rounds()
    front = [n for n in _FORCE_RECHECK if n in QUERIES]
    front += [n for n in _NEW_THIS_ROUND if n in QUERIES and n not in front]
    front += [n for n in QUERIES if n not in green and n not in front]
    order = front + [n for n in QUERIES if n not in front]
    for registry in (QUERIES, ORACLE):
        reordered = {n: registry[n] for n in order if n in registry}
        registry.clear()
        registry.update(reordered)
