"""StructType schemas for the document/question data model.

These re-express the reference's three data layers (SURVEY.md §1) as
Spark schemas:

- parsed-document layer: ``ELEMENT_SCHEMA`` / ``TOPIC_SCHEMA``
  (reference: document_parser/data_types.py:61-120 — the
  ``SyllabusElement`` tagged union and ``SyllabusTopic.to_dict()``
  wire format). Spark has no sum types, so the union becomes a
  discriminator column + nullable branches.
- LLM-extraction layer: ``SUBTOPIC_SCHEMA``, ``PLANNED_QUESTION_SCHEMA``,
  ``QUESTION_SCHEMA`` (reference: data_types.py:7-75 — Pydantic models
  that double as LLM output contracts).

There is no equivalent of the reference's mutable ``State``
(_base_syllabus_ai_graph_template.py:28-54): in Spark the pipeline
state is the lineage between DataFrames.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- parsed-document layer -------------------------------------------------

# One row per document element, in document order. The tagged union
# {paragraph|table} keeps both branches as nullable columns plus the
# `element_type` discriminator (reference: document_parser/data_types.py:61-84).
ELEMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("element_idx", T.LongType(), False),
        T.StructField("element_type", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("rows", T.ArrayType(T.ArrayType(T.StringType())), True),
    ]
)

# `SyllabusTopic.to_dict()` wire schema (document_parser/data_types.py:100-120):
# one row per topic with its elements nested in document order.
TOPIC_ELEMENT_STRUCT = T.StructType(
    [
        T.StructField("type", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("rows", T.ArrayType(T.ArrayType(T.StringType())), True),
    ]
)

TOPIC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("topic_id", T.LongType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("elements", T.ArrayType(TOPIC_ELEMENT_STRUCT), False),
    ]
)

# --- LLM-extraction layer ---------------------------------------------------

# Subtopic (reference: data_types.py:7-15)
SUBTOPIC_SCHEMA = T.StructType(
    [
        T.StructField("subtopic_name", T.StringType(), False),
        T.StructField("topic_title", T.StringType(), False),
        T.StructField("academic_class", T.StringType(), False),
        T.StructField("subject", T.StringType(), False),
        T.StructField("learning_objectives", T.ArrayType(T.StringType()), False),
        T.StructField("key_concepts", T.ArrayType(T.StringType()), False),
        T.StructField("assessment_criteria", T.ArrayType(T.StringType()), False),
        T.StructField("suggested_activities", T.ArrayType(T.StringType()), False),
    ]
)

# PlannedQuestion (reference: data_types.py:62-68); status defaults to
# "planned" and is flipped to "generating" on batch selection
# (syllabus_ai_graph.py:175-176).
PLANNED_QUESTION_SCHEMA = T.StructType(
    [
        T.StructField("question_id", T.StringType(), False),
        T.StructField("topic", T.StringType(), False),
        T.StructField("subtopic", T.StringType(), False),
        T.StructField("difficulty", T.StringType(), False),
        T.StructField("concept_area", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)

QUESTION_CHOICE_STRUCT = T.StructType(
    [
        T.StructField("text", T.StringType(), False),
        T.StructField("is_correct", T.BooleanType(), False),
    ]
)

QUESTION_SOLUTION_STRUCT = T.StructType(
    [
        T.StructField("explanation", T.StringType(), False),
        T.StructField("steps", T.ArrayType(T.StringType()), False),
    ]
)

QUESTION_METADATA_STRUCT = T.StructType(
    [
        T.StructField("created_by", T.StringType(), True),
        T.StructField("created_at", T.StringType(), True),
        T.StructField("updated_at", T.StringType(), True),
        T.StructField("time_estimate", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# Question (reference: data_types.py:41-53); output contract: exactly 4
# choices with exactly 1 correct, non-empty explanation/hint, id and
# difficulty preserved from the plan (syllabus_ai_graph.py:220-231).
QUESTION_SCHEMA = T.StructType(
    [
        T.StructField("question_id", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("topic", T.StringType(), False),
        T.StructField("sub_topic", T.StringType(), False),
        T.StructField("academic_class", T.StringType(), False),
        T.StructField("examination_level", T.StringType(), False),
        T.StructField("difficulty", T.StringType(), False),
        T.StructField("tags", T.ArrayType(T.StringType()), False),
        T.StructField("choices", T.ArrayType(QUESTION_CHOICE_STRUCT), False),
        T.StructField("solution", QUESTION_SOLUTION_STRUCT, False),
        T.StructField("hint", T.StringType(), False),
        T.StructField("metadata", QUESTION_METADATA_STRUCT, True),
    ]
)
