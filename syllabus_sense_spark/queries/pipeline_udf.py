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
  SELECT doc_id, lang, s_de, s_en, s_es, s_fr, s_zh,
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
