"""[EXT] Corpus-internal boilerplate detection: shingles shared by
many documents mark headers/footers/templates, and the per-source
boilerplate fraction is a standard curation quality signal (the
corpus-internal counterpart of the benchmark-contamination check in
ext_training.py).

Shape at scale: one shingle explode (n=5 word-grams, reusing the
ext_dedup machinery), one aggregate on the shingle key to get document
frequency — output bounded by vocabulary, not corpus — one equi-join
back on the shingle key to tag common shingles, then a per-source
rollup of exact integer counts. Micro-averaged fraction (total common
/ total shingles) keeps the arithmetic to a single double division on
identical integers in both engines; a per-doc macro-average would sum
doubles in engine-dependent order.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ..tables import load
from . import register
from .ext_dedup import shingle_docs, sql_shingles

# A shingle is "boilerplate" when it appears in at least this many
# distinct documents.
_MIN_DF = 5

_BOILERPLATE_ORACLE = f"""
WITH corpus AS (SELECT doc_id, text FROM documents),
sh AS ({sql_shingles(5)}),
df AS (
  SELECT shingle, COUNT(*) AS doc_freq FROM sh GROUP BY shingle
),
tagged AS (
  SELECT s.doc_id,
         CASE WHEN d.doc_freq >= {_MIN_DF} THEN 1 ELSE 0 END AS is_common
  FROM sh s JOIN df d ON d.shingle = s.shingle
),
per_doc AS (
  SELECT doc_id,
         COUNT(*) AS n_shingles,
         SUM(is_common) AS n_common
  FROM tagged GROUP BY doc_id
)
SELECT
  doc.source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(p.n_shingles) AS BIGINT) AS n_shingles,
  CAST(SUM(p.n_common) AS BIGINT) AS n_common_shingles,
  CAST(SUM(p.n_common) AS DOUBLE) / SUM(p.n_shingles) AS boilerplate_frac
FROM per_doc p
JOIN documents doc ON doc.doc_id = p.doc_id
GROUP BY doc.source
"""


@register("text_boilerplate_fraction", _BOILERPLATE_ORACLE)
def text_boilerplate_fraction(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    sh = shingle_docs(d.select("doc_id", "text"), n=5)
    df = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("doc_freq"))
    tagged = sh.join(df, "shingle").select(
        "doc_id",
        F.when(F.col("doc_freq") >= _MIN_DF, F.lit(1)).otherwise(F.lit(0)).alias(
            "is_common"
        ),
    )
    per_doc = tagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum("is_common").alias("n_common"),
    )
    return (
        per_doc.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_shingles").cast("bigint").alias("n_shingles"),
            F.sum("n_common").cast("bigint").alias("n_common_shingles"),
            (
                F.sum("n_common").cast("double") / F.sum("n_shingles")
            ).alias("boilerplate_frac"),
        )
    )


# --------------------------------------------------------------------------
# Text normalization: the first stage of every curation pipeline —
# case-fold, collapse runs of whitespace (incl. tabs/newlines), strip
# leading/trailing space. The harness corpus is already clean, so the
# query deterministically re-dirties it first (both engines build the
# identical messy string), then must normalize it back. Pure
# whole-stage-codegen string expressions; the regexes use only
# constructs with identical semantics in Java regex and RE2.
# --------------------------------------------------------------------------

_NORM_ORACLE = r"""
WITH messy AS (
  SELECT doc_id,
         concat('  ', upper(substr(text, 1, 10)), chr(9), substr(text, 11),
                '   ', chr(10)) AS raw
  FROM documents WHERE doc_id % 25 = 1
)
SELECT
  doc_id,
  trim(regexp_replace(lower(raw), '[ \t\n]+', ' ', 'g')) AS norm_text,
  CAST(length(raw) AS BIGINT) AS raw_len,
  CAST(length(trim(regexp_replace(lower(raw), '[ \t\n]+', ' ', 'g'))) AS BIGINT)
    AS norm_len
FROM messy
"""


@register("text_normalize_clean", _NORM_ORACLE)
def text_normalize_clean(spark, sf_dir):
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 1)
    raw = F.concat(
        F.lit("  "),
        F.upper(F.substring("text", 1, 10)),
        F.lit("\t"),
        F.expr("substring(text, 11)"),
        F.lit("   \n"),
    )
    messy = d.select("doc_id", raw.alias("raw"))
    norm = F.trim(F.regexp_replace(F.lower(F.col("raw")), r"[ \t\n]+", " "))
    return messy.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length("raw").cast("bigint").alias("raw_len"),
        F.length(norm).cast("bigint").alias("norm_len"),
    )


# --------------------------------------------------------------------------
# Compression-ratio quality signal (rows-only): zlib-compressed size /
# raw size — the cheap entropy proxy real curation pipelines use to
# flag boilerplate (ratio ≪ typical) and gibberish (ratio ≈ 1). No SQL
# twin (DuckDB has no zlib), so laws live in tests: repetitive text
# compresses far better than varied text, ratio bounds hold.
# Arrow-batched pandas UDF — one Python roundtrip per batch, the
# documented slow-path pattern for logic built-ins cannot express.
# --------------------------------------------------------------------------


@register("text_compression_ratio")  # rows-only: no zlib in DuckDB
def text_compression_ratio(spark, sf_dir):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def comp_ratio(texts: pd.Series) -> pd.Series:
        import zlib

        return texts.map(
            lambda t: round(len(zlib.compress(t.encode("utf-8"), 6)) / len(t), 6)
            if t
            else None
        )

    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "source",
        F.length("text").cast("bigint").alias("n_chars"),
        comp_ratio(F.col("text")).alias("compression_ratio"),
    )


