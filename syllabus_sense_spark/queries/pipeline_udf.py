"""Rows-only queries for the UDF-seam pipeline stages (the
deterministic LLM stand-ins) and the flagship end-to-end pipeline.

These are genuinely non-SQL-expressible (1→N generation inside Python
stand-ins), so the driver records the weaker rows-only check; their
output contracts (choice counts, id preservation, plan sizes) are
asserted in tests/test_pipeline.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType

from ..functions.text import lang_id_heuristic, quality_score
from ..operators.sessionize import group_topics, sessionize_elements
from ..pipeline.extract import extract_subtopics, plan_questions
from ..pipeline.flagship import run_flagship
from ..sources.synthetic import filtered_elements
from ..tables import load
from . import register


def _scalarize(df: DataFrame) -> DataFrame:
    """JSON-encode complex (array/map/struct) columns.

    The driver canonicalizes registered-query output through pandas
    (sort + hash), which cannot sort/hash numpy arrays — so harness
    surfaces must be scalar-only. The underlying pipeline operators
    keep their native nested types; only this registry view flattens.
    """
    cols = [
        F.to_json(F.col(f.name)).alias(f.name)
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


def _topics(spark, sf_dir):
    sess = sessionize_elements(filtered_elements(spark, sf_dir), doc_col="sdoc_id")
    return group_topics(sess, doc_col="sdoc_id").withColumnRenamed("sdoc_id", "doc_id")


@register("pipeline_extract_subtopics")  # rows-only: UDF seam (A8)
def pipeline_extract_subtopics(spark, sf_dir):
    return _scalarize(extract_subtopics(_topics(spark, sf_dir)))


@register("pipeline_plan_questions")  # rows-only: UDF seam (A9)
def pipeline_plan_questions(spark, sf_dir):
    return _scalarize(plan_questions(extract_subtopics(_topics(spark, sf_dir))))


@register("pipeline_flagship_questions")  # rows-only: full pipeline (A8-A16)
def pipeline_flagship_questions(spark, sf_dir):
    return _scalarize(run_flagship(spark, sf_dir))


@register("text_lang_id_heuristic")  # rows-only: heuristic, engine-specific
def text_lang_id_heuristic(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        lang_id_heuristic(F.col("text")).alias("lang_guess"),
        F.round(quality_score(F.col("text")), 6).alias("quality"),
    )
