"""Queries for the UDF-seam pipeline stages (the deterministic LLM
stand-ins) and the flagship end-to-end pipeline.

The A8/A9 seams (extract_subtopics, plan_questions) run as Arrow-
batched ``mapInPandas`` — the production posture for an external
1→N enrichment — but their deterministic stand-ins are md5
arithmetic, which DuckDB can replay exactly: the oracle re-derives
the same expansion with ``CAST('0x' || substr(md5(..),1,8) AS
BIGINT)`` hashes and a bounded index unnest, so a driver hash match
certifies the seam end-to-end (batch iteration, 1→N fan-out,
skip-on-empty discipline, nested-array JSON encoding). The flagship
composite stays rows-only (its A13 generation stage emits nested
choice structs whose JSON-encoding parity is asserted in
tests/test_pipeline.py instead).
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


# _h(s, m) of pipeline/extract.py: first 4 md5 bytes as an integer,
# mod m. Both engines md5 the UTF-8 bytes, so the hex prefix matches
# byte-for-byte (subtopic names contain a non-ASCII em-dash).
def _H(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


# Shared CTE chain: synthetic elements → scan filters → marker
# sessionization → one row per topic (title, non-marker element
# count) → md5-determined subtopic fan-out via a bounded index
# unnest. Mirrors _topics() + pipeline/extract.extract_subtopics.
from ..sources.synthetic import SQL_ELEMENTS as _SQL_EL  # noqa: E402
from ..sources.synthetic import SQL_FILTERED  # noqa: E402

_SQL_SUBTOPICS = f"""
elements AS ({_SQL_EL}),
filtered AS (SELECT * FROM elements WHERE {{filtered}}),
sess AS (
  SELECT *,
    SUM(CASE WHEN is_topic_marker THEN 1 ELSE 0 END)
      OVER (PARTITION BY sdoc_id ORDER BY element_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS topic_id
  FROM filtered
),
topics AS (
  SELECT
    MAX(CASE WHEN is_topic_marker THEN
          regexp_replace(regexp_replace(text, 'Core element', ''),
                         '^[\\s\\-:]+|[\\s\\-:]+$', '', 'g')
        END) AS title,
    COUNT(CASE WHEN NOT is_topic_marker THEN 1 END) AS n_elem
  FROM sess
  WHERE topic_id > 0
  GROUP BY sdoc_id, topic_id
),
fanout AS (
  SELECT title, n_elem, i.range AS i,
         title || ' — part ' || CAST(i.range + 1 AS VARCHAR) AS name
  FROM topics, range(4) i
  WHERE trim(coalesce(title, '')) <> ''
    AND i.range < 2 + {_H("'nsub:' || title")} % 3
)"""


_EXTRACT_ORACLE = f"""
WITH {_SQL_SUBTOPICS.format(filtered=SQL_FILTERED)}
SELECT
  name AS subtopic_name,
  title AS topic_title,
  'Form ' || CAST(1 + {_H("name")} % 2 AS VARCHAR) AS academic_class,
  'chemistry' AS subject,
  CASE WHEN {_H("name")} % 2 = 0
       THEN '["objective 1 of ' || name || '","objective 2 of ' || name || '"]'
       ELSE '["objective 1 of ' || name || '","objective 2 of ' || name
            || '","objective 3 of ' || name || '"]'
  END AS learning_objectives,
  CASE 1 + n_elem % 3
       WHEN 1 THEN '["concept 1"]'
       WHEN 2 THEN '["concept 1","concept 2"]'
       ELSE '["concept 1","concept 2","concept 3"]'
  END AS key_concepts,
  '["criterion 1","criterion 2"]' AS assessment_criteria,
  CASE 1 + {_H("name")} % 3
       WHEN 1 THEN '["activity 1"]'
       WHEN 2 THEN '["activity 1","activity 2"]'
       ELSE '["activity 1","activity 2","activity 3"]'
  END AS suggested_activities
FROM fanout
"""


@register("pipeline_extract_subtopics", _EXTRACT_ORACLE)  # A8 seam
def pipeline_extract_subtopics(spark, sf_dir):
    return _scalarize(extract_subtopics(_topics(spark, sf_dir)))


_PLAN_ORACLE = f"""
WITH {_SQL_SUBTOPICS.format(filtered=SQL_FILTERED)},
questions AS (
  SELECT
    title, name, n_elem, q.range AS qi,
    md5(title || '|' || name || '|' || CAST(q.range AS VARCHAR)) AS qmd5
  FROM fanout, range(12) q
  WHERE q.range < 9 + {_H("'nq:' || name")} % 3
)
SELECT
  'q_' || substr(qmd5, 1, 12) AS question_id,
  title AS topic,
  name AS subtopic,
  CASE {_H("substr(qmd5, 1, 12)")} % 3
       WHEN 0 THEN 'Easy' WHEN 1 THEN 'Medium' ELSE 'Hard'
  END AS difficulty,
  'concept ' || CAST(1 + qi % (1 + n_elem % 3) AS VARCHAR) AS concept_area,
  'planned' AS status
FROM questions
"""


@register("pipeline_plan_questions", _PLAN_ORACLE)  # A9 seam
def pipeline_plan_questions(spark, sf_dir):
    return _scalarize(plan_questions(extract_subtopics(_topics(spark, sf_dir))))


# A13 stand-in replay: choices/solution/metadata are nested
# struct/array columns JSON-encoded by _scalarize via Spark's
# to_json (compact, schema field order, UTF-8 passthrough); the
# oracle rebuilds the identical byte strings by explicit concat so
# no engine-specific JSON writer is on the comparison path.
_CHOICES_SQL = "'[' || " + " || ',' || ".join(
    f"""'{{"text":"choice {j + 1} for ' || qid || '","is_correct":' ||
     CASE WHEN {_H("qid")} % 4 = {j} THEN 'true' ELSE 'false' END || '}}'"""
    for j in range(4)
) + " || ']'"

_FLAGSHIP_ORACLE = f"""
WITH {_SQL_SUBTOPICS.format(filtered=SQL_FILTERED)},
questions AS (
  SELECT
    title, name, n_elem, q.range AS qi,
    md5(title || '|' || name || '|' || CAST(q.range AS VARCHAR)) AS qmd5
  FROM fanout, range(12) q
  WHERE q.range < 9 + {_H("'nq:' || name")} % 3
),
gen AS (
  SELECT
    'q_' || substr(qmd5, 1, 12) AS qid,
    title, name,
    'concept ' || CAST(1 + qi % (1 + n_elem % 3) AS VARCHAR) AS concept_area,
    CASE {_H("substr(qmd5, 1, 12)")} % 3
         WHEN 0 THEN 'Easy' WHEN 1 THEN 'Medium' ELSE 'Hard'
    END AS difficulty
  FROM questions
)
SELECT
  qid AS question_id,
  'Question on ' || concept_area || ' (' || qid || ')?' AS text,
  title AS topic,
  name AS sub_topic,
  'Form ' || CAST(1 + {_H("name")} % 2 AS VARCHAR) AS academic_class,
  'MSCE' AS examination_level,
  difficulty,
  '["' || concept_area || '","' || lower(difficulty) || '"]' AS tags,
  {_CHOICES_SQL} AS choices,
  '{{"explanation":"Because choice ' || CAST({_H("qid")} % 4 + 1 AS VARCHAR)
    || ' is correct.","steps":["step 1","step 2"'
    || CASE WHEN {_H("qid || 's'")} % 2 = 1 THEN ',"step 3"' ELSE '' END
    || ']}}' AS solution,
  'Consider ' || concept_area || '.' AS hint,
  '{{"created_by":"syllabus_sense_spark","created_at":"2026-01-01T00:00:00Z"'
    || ',"updated_at":"2026-01-01T00:00:00Z","time_estimate":{{"minutes":"'
    || CAST(1 + {_H("qid")} % 5 AS VARCHAR) || '"}}}}' AS metadata
FROM gen
"""


@register("pipeline_flagship_questions", _FLAGSHIP_ORACLE)  # A8-A16 chain
def pipeline_flagship_questions(spark, sf_dir):
    return _scalarize(run_flagship(spark, sf_dir))


# DuckDB twin of functions/text.py lang_id_heuristic + quality_score.
# Kept in expression-tree lockstep so every IEEE op matches: cue hit
# counts sum left-to-right as ((c1+c2)+c3) (IEEE 0+x==x makes Python's
# sum() start value a no-op); the argmax CASE chain reproduces the
# strict-> loop (ties -> lexicographically first language); the
# quality composite associates as ((d*0.4)+(l*0.4))+(t*0.2); the
# output is integer-scaled (floor(q*1e6) as bigint) because round-half
# conventions differ between engines while floor of bit-identical
# doubles does not.
_CUE_LANGS = ("de", "en", "es", "fr", "zh")
_CUES_SQL = {
    "en": ("the", "and", "ing"),
    "es": ("los", "ado", "cio"),
    "de": ("der", "sch", "ung"),
    "fr": ("les", "ent", "ion"),
    "zh": ("zh_", "shi", "de_"),
}


def _cue_score_sql(lang: str) -> str:
    parts = [
        f"(length(l) - length(replace(l, '{cue}', ''))) / {len(cue)}"
        for cue in _CUES_SQL[lang]
    ]
    return f"(({parts[0]} + {parts[1]}) + {parts[2]})"


_LANG_ORACLE = f"""
WITH base AS (
  SELECT doc_id, lang, text, lower(text) AS l,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> length(x) > 0) AS toks
  FROM documents
),
scored AS (
  SELECT doc_id, lang, text, toks,
         {", ".join(f"{_cue_score_sql(lg)} AS s_{lg}" for lg in _CUE_LANGS)}
  FROM base
),
q AS (
  SELECT doc_id, lang, text, s_de, s_en, s_es, s_fr, s_zh,
         CAST(len(list_distinct(toks)) AS DOUBLE)
           / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS diversity,
         least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0) AS length_ok,
         CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
           / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS avg_tok
  FROM scored
)
SELECT
  doc_id,
  lang,
  CASE
    WHEN text IS NULL THEN 'und'
    WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
    WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
    WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
    WHEN s_fr >= s_zh THEN 'fr'
    ELSE 'zh'
  END AS lang_guess,
  CAST(floor((((diversity * 0.4) + (length_ok * 0.4))
        + (CASE WHEN avg_tok >= 2 AND avg_tok <= 12
                THEN 1.0 ELSE 0.5 END * 0.2)) * 1e6) AS BIGINT) AS quality_e6
FROM q
"""


@register("text_lang_id_heuristic", _LANG_ORACLE)
def text_lang_id_heuristic(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        lang_id_heuristic(F.col("text")).alias("lang_guess"),
        F.floor(quality_score(F.col("text")) * F.lit(1e6))
        .cast("bigint")
        .alias("quality_e6"),
    )
