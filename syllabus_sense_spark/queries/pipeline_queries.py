"""Document-pipeline operators (SURVEY.md §2 Table A) over the
deterministic synthetic element/plan streams, each oracle-checked.

- A3/A4/A5: scan-time filters + marker sessionization + title strip
- A10/A11: batch pagination + conditional status update
- A12: broadcast lookup join with the reference's miss-drop semantics
- A16: union-accumulate
- A19: topic limit
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.batching import assign_batches
from ..operators.sessionize import extract_title, sessionize_elements
from ..sources.synthetic import (
    MARKER,
    SQL_ELEMENTS,
    SQL_FILTERED,
    SQL_PLAN,
    filtered_elements,
    planned_questions,
)
from ..tables import load
from . import register

_SESSIONIZE_ORACLE = f"""
WITH elements AS ({SQL_ELEMENTS}),
filtered AS (SELECT * FROM elements WHERE {SQL_FILTERED}),
sess AS (
  SELECT *,
    SUM(CASE WHEN is_topic_marker THEN 1 ELSE 0 END)
      OVER (PARTITION BY sdoc_id ORDER BY element_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS topic_id
  FROM filtered
)
SELECT
  sdoc_id,
  CAST(topic_id AS BIGINT) AS topic_id,
  MAX(CASE WHEN is_topic_marker THEN
        regexp_replace(regexp_replace(text, 'Core element', ''),
                       '^[\\s\\-:]+|[\\s\\-:]+$', '', 'g')
      END) AS title,
  COUNT(CASE WHEN NOT is_topic_marker THEN 1 END) AS n_elements,
  COUNT(CASE WHEN element_type = 'table' THEN 1 END) AS n_tables,
  MIN(element_idx) AS first_idx,
  MAX(element_idx) AS last_idx,
  NULLIF(COALESCE(string_agg(
      CASE WHEN NOT is_topic_marker AND element_type = 'paragraph' THEN text END,
      '|' ORDER BY element_idx), ''), '') AS paragraphs
FROM sess
WHERE topic_id > 0
GROUP BY sdoc_id, topic_id
"""


@register("pipeline_sessionize_topics", _SESSIONIZE_ORACLE)
def pipeline_sessionize_topics(spark, sf_dir):
    """A5: marker-based sessionization (syllabus_parser.py:118-154).

    One shuffle on sdoc_id; preamble (topic_id 0) discarded exactly as
    the reference does (:147-149). Scalar projection of the grouped
    topic so the oracle can hash it; the nested `elements` form is
    covered by operators.sessionize.group_topics in tests.
    """
    sess = sessionize_elements(
        filtered_elements(spark, sf_dir), doc_col="sdoc_id"
    )
    title = F.max(
        F.when(F.col("is_topic_marker"), extract_title(F.col("text"), MARKER))
    ).alias("title")
    para = F.when(
        (~F.col("is_topic_marker")) & (F.col("element_type") == "paragraph"),
        F.struct(F.col("element_idx").alias("idx"), F.col("text").alias("text")),
    )
    paragraphs = F.nullif(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(para)), lambda s: s["text"]
            ),
            "|",
        ),
        F.lit(""),
    ).alias("paragraphs")
    return sess.groupBy("sdoc_id", F.col("topic_id").cast("long").alias("topic_id")).agg(
        title,
        F.count(F.when(~F.col("is_topic_marker"), F.lit(1))).alias("n_elements"),
        F.count(F.when(F.col("element_type") == "table", F.lit(1))).alias("n_tables"),
        F.min("element_idx").alias("first_idx"),
        F.max("element_idx").alias("last_idx"),
        paragraphs,
    )


_BATCH_ORACLE = f"""
WITH plan AS ({SQL_PLAN}),
batched AS (
  SELECT *,
    CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY topic ORDER BY question_id) - 1) / 5)
         AS BIGINT) AS batch_id
  FROM plan
)
SELECT
  topic,
  batch_id,
  COUNT(*) AS batch_n,
  MIN(question_id) AS first_qid,
  MAX(question_id) AS last_qid
FROM batched
GROUP BY topic, batch_id
"""


@register("pipeline_batch_assignment", _BATCH_ORACLE)
def pipeline_batch_assignment(spark, sf_dir):
    """A10: pagination cursor → deterministic batch_id
    (syllabus_ai_graph.py:146-182). All batches exist at once; the
    loop node (A17) vanishes."""
    plan = planned_questions(spark, sf_dir)
    batched = assign_batches(plan, batch_size=5, group_cols=("topic",), order_col="question_id")
    return batched.groupBy("topic", "batch_id").agg(
        F.count(F.lit(1)).alias("batch_n"),
        F.min("question_id").alias("first_qid"),
        F.max("question_id").alias("last_qid"),
    )


_STATUS_ORACLE = f"""
WITH plan AS ({SQL_PLAN}),
batched AS (
  SELECT *,
    CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY topic ORDER BY question_id) - 1) / 5)
         AS BIGINT) AS batch_id
  FROM plan
)
SELECT
  question_id,
  topic,
  batch_id,
  CASE WHEN batch_id = 0 THEN 'generating' ELSE status END AS status
FROM batched
"""


@register("pipeline_status_update", _STATUS_ORACLE)
def pipeline_status_update(spark, sf_dir):
    """A11: conditional column update (syllabus_ai_graph.py:175-176)."""
    plan = planned_questions(spark, sf_dir)
    batched = assign_batches(plan, batch_size=5, group_cols=("topic",), order_col="question_id")
    return batched.select(
        "question_id",
        "topic",
        "batch_id",
        F.when(F.col("batch_id") == 0, F.lit("generating"))
        .otherwise(F.col("status"))
        .alias("status"),
    )


_LOOKUP_ORACLE = f"""
WITH plan AS ({SQL_PLAN}),
subtopics AS (
  SELECT DISTINCT source AS subtopic_name, 'Form 1' AS academic_class
  FROM documents
  WHERE CAST(regexp_extract(source, '([0-9]+)', 1) AS INTEGER) % 4 <> 0
)
SELECT
  p.subtopic,
  s.academic_class,
  COUNT(*) AS n_planned
FROM plan p
JOIN subtopics s ON p.subtopic = s.subtopic_name
GROUP BY p.subtopic, s.academic_class
"""


@register("pipeline_lookup_join_missdrop", _LOOKUP_ORACLE)
def pipeline_lookup_join_missdrop(spark, sf_dir):
    """A12: the subtopic lookup join with miss-drop (inner) semantics
    (syllabus_ai_graph.py:191-201) — dangling plan rows vanish, exactly
    as the reference drops batches whose subtopic is missing. The
    small dim broadcasts."""
    plan = planned_questions(spark, sf_dir)
    d = load(spark, sf_dir, "documents")
    subtopics = (
        d.filter(F.regexp_extract("source", "([0-9]+)", 1).cast("int") % 4 != 0)
        .select(
            F.col("source").alias("subtopic_name"),
            F.lit("Form 1").alias("academic_class"),
        )
        .distinct()
    )
    return (
        plan.join(
            F.broadcast(subtopics),
            plan.subtopic == subtopics.subtopic_name,
            "inner",
        )
        .groupBy("subtopic", "academic_class")
        .agg(F.count(F.lit(1)).alias("n_planned"))
    )


_UNION_ORACLE = f"""
WITH plan AS ({SQL_PLAN})
SELECT topic, COUNT(*) AS n_rows
FROM (
  SELECT topic FROM plan WHERE difficulty = 'Easy'
  UNION ALL
  SELECT topic FROM plan WHERE difficulty = 'Hard'
) u
GROUP BY topic
"""


@register("pipeline_union_accumulate", _UNION_ORACLE)
def pipeline_union_accumulate(spark, sf_dir):
    """A16: union-accumulate (syllabus_ai_graph.py:274-283) — in Spark
    the accumulation loop is a single unionByName."""
    plan = planned_questions(spark, sf_dir)
    easy = plan.filter(F.col("difficulty") == "Easy").select("topic")
    hard = plan.filter(F.col("difficulty") == "Hard").select("topic")
    return easy.unionByName(hard).groupBy("topic").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


_LIMIT_ORACLE = f"""
WITH elements AS ({SQL_ELEMENTS}),
filtered AS (SELECT * FROM elements WHERE {SQL_FILTERED}),
sess AS (
  SELECT *,
    SUM(CASE WHEN is_topic_marker THEN 1 ELSE 0 END)
      OVER (PARTITION BY sdoc_id ORDER BY element_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS topic_id
  FROM filtered
)
SELECT
  sdoc_id,
  CAST(topic_id AS BIGINT) AS topic_id,
  MAX(CASE WHEN is_topic_marker THEN
        regexp_replace(regexp_replace(text, 'Core element', ''),
                       '^[\\s\\-:]+|[\\s\\-:]+$', '', 'g')
      END) AS title
FROM sess
WHERE topic_id > 0
GROUP BY sdoc_id, topic_id
ORDER BY sdoc_id, topic_id
LIMIT 5
"""


@register("pipeline_limit_topics", _LIMIT_ORACLE)
def pipeline_limit_topics(spark, sf_dir):
    """A19: `process(topics_num)` → ordered limit on topics
    (_base_syllabus_ai_graph_template.py:127-128)."""
    sess = sessionize_elements(filtered_elements(spark, sf_dir), doc_col="sdoc_id")
    title = F.max(
        F.when(F.col("is_topic_marker"), extract_title(F.col("text"), MARKER))
    ).alias("title")
    return (
        sess.groupBy("sdoc_id", F.col("topic_id").cast("long").alias("topic_id"))
        .agg(title)
        .orderBy("sdoc_id", "topic_id")
        .limit(5)
    )
