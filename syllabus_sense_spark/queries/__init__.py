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


def load_all_queries() -> None:
    """Import every query module (idempotent) to fill the registry.

    Registration order is deliberate: the driver verifies queries in
    registration order under a time budget, so the modules whose
    queries have not yet carried a CORRECTNESS row (every ``ext_*``
    extension operator, pipeline, events, scalar-function family)
    register FIRST, oracle-ready before rows-only; the 48 queries
    already proven green in round 1 (relational*/windows*) register
    last.
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
