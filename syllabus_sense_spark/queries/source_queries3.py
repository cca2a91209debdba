"""Python DataSource filter pushdown (Spark 4.1) — the docx connector
now implements ``pushFilters``: a pushed ``path = <literal>`` prunes
whole FILES at partition planning (the source-level partition-pruning
shape — at 100 TB you skip the objects, not the rows), and a pushed
``element_type = <literal>`` drops rows at parse time before they
ever cross into the JVM. Unsupported filters are handed back, so
Spark re-applies them post-scan — pushdown stays transparent.

The registered query scans the real reference fixture with the
paragraph filter pushed (the gating conf
``spark.sql.python.filterPushdown.enabled`` is scoped to this
query's execution and restored, same posture as
join_bloom_runtime_filter) and aggregates to one row. Oracle: a
GOLDEN literal — DuckDB cannot unzip OOXML, but the fixture is fixed,
so the expected counts are pinned by independent measurement
(29 paragraphs / 18 tables in the container; paragraph chars 2914 —
asserted again in tests/test_round7_ops.py, which also pins the
partition-pruning and unsupported-filter contracts directly on the
reader).

Reference anchor: A1 (document_parser/syllabus_parser.py:156-172) —
the reference's only connector, now with predicate pushdown its
linear scan never had.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from . import register

_FIXTURE = "/root/reference/chemistry_form_1_2.docx"

_PUSHDOWN_ORACLE = """
SELECT 'paragraph' AS element_type,
       CAST(29 AS BIGINT) AS n_elements,
       CAST(29 AS BIGINT) AS n_nonempty,
       CAST(2914 AS BIGINT) AS total_chars
"""

_PUSH_CONF = {"spark.sql.python.filterPushdown.enabled": "true"}


@register("source_docx_pushdown", _PUSHDOWN_ORACLE)
def source_docx_pushdown(spark, sf_dir):
    from ..sources.docx_datasource import register_docx_source
    from .relational12 import scoped_confs

    if not os.path.exists(_FIXTURE):
        # Harness-portable guard (same posture as docx_parse_topics):
        # without the fixture return the golden shape with zero rows.
        return spark.createDataFrame(
            [],
            "element_type string, n_elements long, n_nonempty long,"
            " total_chars long",
        )
    register_docx_source(spark)
    with scoped_confs(spark, _PUSH_CONF):
        df = (
            spark.read.format("docx")
            .load(os.path.dirname(_FIXTURE))
            .filter(F.col("element_type") == "paragraph")
            .groupBy("element_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_elements"),
                F.sum(
                    F.when(F.length(F.trim("text")) > 0, 1).otherwise(0)
                )
                .cast("long")
                .alias("n_nonempty"),
                F.sum(F.length("text")).cast("long").alias("total_chars"),
            )
        )
        # Materialize while the pushdown conf is active; the returned
        # handle no longer depends on it. Rotated: the tiny result
        # checkpoint is released when the query next runs.
        from ._util import rotate_checkpoint

        return rotate_checkpoint(
            "source_queries3.docx_pushdown", df.localCheckpoint()
        )
